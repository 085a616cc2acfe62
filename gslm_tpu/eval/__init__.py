"""Offline evaluation tooling: render sets, quality metrics, full-eval.

Parity layer for the reference's L6 CLIs (render.py, metrics.py,
full_eval.py — SURVEY.md §1 L6): render train/test sets from a trained
model, score SSIM/PSNR/LPIPS against ground truth, and orchestrate the
multi-scene benchmark sweep.
"""
