#!/bin/bash
# Hardware measurement queue — run when the TPU tunnel recovers
# (it was wedged for the entire second half of round 4; probe first:
# `timeout 120 python -c "import jax,numpy;print(numpy.asarray(jax.numpy.ones((256,256))@jax.numpy.ones((256,256)))[0,0])"`).
#
# Pending points this queue produces:
#   1. bench.py preview (median-of-3 resident 1M sweep)
#   2. VDF_RING_PIPELINE A/B at 1M and 4M -> decide the default
#   3. ring@16M with the round-4 setup fixes (aligned no-pad path)
#   4. public-API e2e search at 1M on silicon
# plus tools/probe_int4.py (int4-vs-int8 MXU rate — if int4 is 2x,
# the sweep roof doubles).
# Each step logs to its own file; continues past failures.
cd /root/repo
mkdir -p /tmp/hw
set -x

# 0. quick probe (fail fast if wedged again)
timeout 120 python /tmp/probe_matmul.py > /tmp/hw/00_probe.log 2>&1 || { echo WEDGED; exit 1; }

# 1. bench.py preview (median-of-3 resident sweep at 1M)
timeout 1800 python bench.py > /tmp/hw/01_bench.log 2>&1

# 2. ring pipeline A/B at 1M (defaults off vs on)
VDF_SCALE_BACKEND=ring VDF_SCALE_NS=1000000 VDF_SCALE_OUT=/tmp/hw/ring_1m_off.json \
  timeout 3600 python tools/bench_scale.py > /tmp/hw/02_ring1m_off.log 2>&1
VDF_RING_PIPELINE=1 VDF_SCALE_BACKEND=ring VDF_SCALE_NS=1000000 VDF_SCALE_OUT=/tmp/hw/ring_1m_on.json \
  timeout 3600 python tools/bench_scale.py > /tmp/hw/03_ring1m_on.log 2>&1

# 3. ring pipeline A/B at 4M
VDF_SCALE_BACKEND=ring VDF_SCALE_NS=4000000 VDF_SCALE_OUT=/tmp/hw/ring_4m_off.json \
  timeout 3600 python tools/bench_scale.py > /tmp/hw/04_ring4m_off.log 2>&1
VDF_RING_PIPELINE=1 VDF_SCALE_BACKEND=ring VDF_SCALE_NS=4000000 VDF_SCALE_OUT=/tmp/hw/ring_4m_on.json \
  timeout 3600 python tools/bench_scale.py > /tmp/hw/05_ring4m_on.log 2>&1

# 4. ring @16M with the setup fixes (was pending the tunnel outage)
VDF_SCALE_BACKEND=ring VDF_SCALE_NS=16000000 VDF_SCALE_OUT=/tmp/hw/ring_16m.json \
  timeout 7200 python tools/bench_scale.py > /tmp/hw/06_ring16m.log 2>&1

# 5. public-API e2e search bench at 1M
VDF_E2E_N=1000000 VDF_E2E_ITERS=2 timeout 3600 python tools/bench_search_e2e.py \
  > /tmp/hw/07_e2e_search.json 2> /tmp/hw/07_e2e_search.log

echo QUEUE_DONE
