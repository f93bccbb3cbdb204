"""Sparse symbolic planner tests (native C++ with Python fallback) — the
KLU-symbolic replacement (SURVEY.md §2.10)."""

import numpy as np

from cedarsim_tpu import parse_spice, elaborate, compile_circuit
from cedarsim_tpu.ops import sparse
from cedarsim_tpu.native import get_lib


def _dff():
    with open("benchmarks/gf180_dff/dff_tb.cir") as f:
        nl = parse_spice(f.read(), file="dff_tb.cir")
    return compile_circuit(elaborate(nl, include_paths=["benchmarks/gf180_dff"]))


def test_native_library_builds():
    assert get_lib() is not None, "g++ toolchain expected in this image"


def test_sparsity_pattern_matches_numeric():
    import jax, jax.numpy as jnp
    from cedarsim_tpu import SimSpec
    c = _dff()
    rows, cols = sparse.jacobian_sparsity(c)
    ctx = SimSpec.make(gmin=1e-15).with_mode("tranop")
    x = jnp.full(c.n_x, 0.3, c.dtype)
    G, C = jax.jit(lambda x: c.jacobians(x, ctx))(x)
    M = np.abs(np.asarray(G)) + np.abs(np.asarray(C))
    nz = set(zip(*np.nonzero(M)))
    pat = set(zip(rows.tolist(), cols.tolist()))
    # every numeric nonzero must be inside the structural pattern
    assert nz <= pat


def test_md_ordering_reduces_fill():
    c = _dff()
    p = sparse.plan(c)
    assert p["n"] == c.n_x
    assert len(np.unique(p["perm"])) == c.n_x  # a valid permutation
    assert p["lnnz"] <= p["lnnz_natural"]      # fill never worse than natural


def test_python_fallback_agrees():
    c = _dff()
    rows, cols = sparse.jacobian_sparsity(c)
    n = c.n_x
    perm_nat = np.arange(n, dtype=np.int32)
    lib_fill = sparse.symbolic_fill(n, rows, cols, perm_nat)
    indptr, indices = sparse._to_csr(n, rows, cols)
    py_fill = sparse._symbolic_fill_py(n, indptr, indices, perm_nat)
    assert lib_fill == py_fill
