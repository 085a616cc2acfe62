#!/bin/bash
# First-order (Adam) training run matching the reference's
# run_train_train.sh invocation (dense test-iteration sweep).
python -m gslm_tpu.train -s "${1:-data/tandt/train}" \
  --test_iterations $(seq 1000 1000 29000)
