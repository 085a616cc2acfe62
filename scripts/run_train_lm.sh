#!/bin/bash
# LM trainer run matching the reference's run_train_jvp_train.sh
# (note --jvp_start 40000 = LM disabled for the first-order baseline;
# drop it, or set e.g. 15001, to exercise the LM phase).
python -m gslm_tpu.train_lm -s "${1:-data/tandt/train}" --jvp_start 40000 \
  --test_iterations $(seq 1000 1000 29000) \
  --checkpoint_iterations 15000 20000
