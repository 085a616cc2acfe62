#!/bin/bash
# Poll the axon TPU tunnel; when it recovers, run the round-3 measurement
# worklist (stage profile, scatter microbench, full bench, trainer smoke),
# logging to /tmp/tpu_*.log. Safe to leave running via nohup.
cd /root/repo
probe() {
  timeout 60 python -u -c "import jax; assert jax.devices()[0].platform == 'tpu'" 2>/dev/null
}
echo "[tpu_worklist] polling for tunnel recovery ($(date))"
until probe; do
  sleep 300
done
echo "[tpu_worklist] TPU RECOVERED ($(date)) — running worklist"
timeout 3600 python bench.py > /tmp/tpu_bench.log 2>&1
echo "[tpu_worklist] bench done ($(date))"
timeout 900 python scripts/bench_scatter.py 1280000 131072 > /tmp/tpu_scatter.log 2>&1
echo "[tpu_worklist] scatter-131k done ($(date))"
timeout 1500 python scripts/bench_stages.py > /tmp/tpu_stages.log 2>&1
echo "[tpu_worklist] stages done ($(date))"
timeout 900 python scripts/bench_scatter.py 10485760 1048576 >> /tmp/tpu_scatter.log 2>&1
echo "[tpu_worklist] scatter-1M done ($(date))"
timeout 1500 python scripts/smoke_tpu_cli.py > /tmp/tpu_smoke.log 2>&1
echo "[tpu_worklist] smoke done ($(date)) — ALL DONE"
