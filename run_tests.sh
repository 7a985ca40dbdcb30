#!/bin/bash
# Full test suite in three processes: the XLA CPU compiler can segfault when
# too many large executables accumulate in one process (seen on the ctu64
# P-tree compile mid-suite; it passes standalone). ctu64 gets its own
# process; the rest is split in two halves to keep each comfortable.
# A crash mid-cache-write can corrupt .jax_cache — if a run segfaults inside
# compilation_cache get_executable_and_time, `rm -rf .jax_cache` and re-run.
set -e
ENV="env PYTHONPATH= JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu"
$ENV python -m pytest tests/test_api.py tests/test_b_device.py \
    tests/test_b_frames.py tests/test_chunk.py \
    tests/test_deblock.py tests/test_decisions_fast.py tests/test_e2e_intra.py \
    tests/test_entropy.py tests/test_golden_ops.py -q "$@"
$ENV python -m pytest tests/test_ctu64.py -q "$@"
$ENV python -m pytest tests/test_inter.py tests/test_intra_jax.py \
    tests/test_intra_split.py tests/test_me_hier.py tests/test_multichip.py \
    tests/test_native_entropy.py tests/test_p_jax.py tests/test_p_tree.py \
    tests/test_row_qp.py tests/test_sao.py tests/test_scene_change.py \
    tests/test_sign_hiding.py tests/test_tables.py tests/test_wpp.py -q "$@"
$ENV python -m pytest tests/test_rd_mode.py tests/test_intra_tu_split.py \
    tests/test_multihost.py -q "$@"
