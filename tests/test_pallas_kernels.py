"""Interpret-mode parity for the Pallas TPU kernels (CPU-runnable).

Each check runs in a SUBPROCESS on a single-device CPU backend: pallas
``interpret=True`` under this suite's 8-virtual-device flag is
pathologically slow for the field-arithmetic kernels (measured r5: the FRI
fold at n=256 did not finish in 15 minutes under the flag vs 2.5 s
single-device; reproduces on the round-4 tree, i.e. an XLA-CPU
multi-device pathology, not a kernel regression).  The check bodies live in
tests/interp_checks.py; the compiled-Mosaic path is exercised on real TPU
by bench.py and tools/r05_kernel_check.py, which cross-check against the
jnp/host references before timing.
"""

from interp_checks import run_check_subprocess


def test_fold_pallas_interpret_matches_jnp():
    run_check_subprocess("fold")


def test_blake2b_pallas_interpret_parity():
    run_check_subprocess("blake2b_leaf")


def test_node_split_pallas_interpret_parity():
    run_check_subprocess("node_split")
