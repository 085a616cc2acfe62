"""Dataset preparation tools (COLMAP conversion, depth-scale alignment)."""
