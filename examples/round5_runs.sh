#!/bin/bash
# Round-5 measurement queue: every chip-bound artifact run, sequential
# (concurrent chip jobs skew each other's timings). Logs to /tmp/r5_*.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# chip-gated regression gates: bench floors + 1M full-vjp chain pin
GOI_SCALE_TEST=1 timeout 2400 python -m pytest \
  tests/test_bench_floor.py \
  "tests/test_chunked_render.py::test_chain_vs_scatter_full_vjp_1m" \
  -q -p no:cacheprovider 2>&1 | tail -8 > /tmp/r5_gates.log

# production-scale RGB training run (SCALE_RGB.json)
timeout 5400 python examples/scale_rgb.py > /tmp/r5_rgb.log 2>&1

# adversarial 500k semantic variant (SCALE_TRAIN_ADV.json)
timeout 5400 python examples/scale_train.py --variant adversarial \
  > /tmp/r5_adv.log 2>&1

# precision sweep refresh (PRECISION_SWEEP.json)
timeout 2400 python examples/profile_precision.py \
  > /tmp/r5_precision.log 2>&1

# stage + chain profiles at both configs
timeout 2400 python examples/profile_stages.py --n 1000000 \
  > /tmp/r5_stages1m.log 2>&1
timeout 1800 python examples/profile_chain.py --iters 10 \
  > /tmp/r5_chain.log 2>&1

echo DONE_ALL
