"""Sparse structure planning for large circuits.

The dense batched LU (ops/linalg.py) is the right call below a few hundred
unknowns — it runs on the MXU and vmaps perfectly.  Beyond that, a sparse
factorization with a *precomputed symbolic structure* wins; TPU kernels need
static sparsity, so the planning happens once per circuit at compile time in
native code (cedarsim_tpu/native/symbolic.cpp — minimum-degree ordering +
elimination symbolic pass), with a pure-Python fallback.

This module provides the structural analysis; the on-device numeric
factorization kernel over the planned pattern is the next stage of the
sparse path.
"""

from __future__ import annotations

import numpy as np

from cedarsim_tpu.native import get_lib


def jacobian_sparsity(compiled):
    """Structural (row, col) pattern of G+C from the compiled circuit's
    gather/scatter index arrays — no numerics involved."""
    n = compiled.n_x
    rows, cols = [], []
    for key in compiled.group_order:
        g = compiled.groups[key]
        r = g.row_idx[:, :, None]
        c = g.var_idx[:, None, :]
        rr = np.broadcast_to(r, (r.shape[0], r.shape[1], c.shape[2]))
        cc = np.broadcast_to(c, rr.shape)
        rows.append(rr.ravel())
        cols.append(cc.ravel())
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    keep = (rows < n) & (cols < n)
    rows, cols = rows[keep], cols[keep]
    # plus the diagonal (gmin shunts / integrator terms)
    rows = np.concatenate([rows, np.arange(n)])
    cols = np.concatenate([cols, np.arange(n)])
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    dedup = np.ones(len(rows), bool)
    dedup[1:] = (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])
    return rows[dedup].astype(np.int32), cols[dedup].astype(np.int32)


def _to_csr(n, rows, cols):
    indptr = np.zeros(n + 1, np.int32)
    np.add.at(indptr, rows + 1, 1)
    indptr = np.cumsum(indptr).astype(np.int32)
    return indptr, cols.astype(np.int32)


def md_order(n, rows, cols):
    """Minimum-degree fill-reducing ordering (native; python fallback)."""
    indptr, indices = _to_csr(n, rows, cols)
    lib = get_lib()
    if lib is not None:
        import ctypes
        perm = np.zeros(n, np.int32)
        lib.csim_md_order(
            n, indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        return perm
    return _md_order_py(n, indptr, indices)


def symbolic_fill(n, rows, cols, perm):
    """L-nnz (strict lower, symmetrized) when eliminating in perm order."""
    indptr, indices = _to_csr(n, rows, cols)
    lib = get_lib()
    if lib is not None:
        import ctypes
        return int(lib.csim_symbolic_fill(
            n, indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            np.asarray(perm, np.int32).ctypes.data_as(
                ctypes.POINTER(ctypes.c_int)), None))
    return _symbolic_fill_py(n, indptr, indices, perm)


def plan(compiled):
    """Full structural plan: (perm, lnnz_md, lnnz_natural, pattern_nnz)."""
    rows, cols = jacobian_sparsity(compiled)
    n = compiled.n_x
    perm = md_order(n, rows, cols)
    lnnz = symbolic_fill(n, rows, cols, perm)
    lnnz_nat = symbolic_fill(n, rows, cols, np.arange(n, dtype=np.int32))
    return dict(perm=perm, lnnz=lnnz, lnnz_natural=lnnz_nat,
                nnz=len(rows), n=n, native=get_lib() is not None)


# ------------------------------------------------------- python fallbacks

def _adj(n, indptr, indices):
    adj = [set() for _ in range(n)]
    for i in range(n):
        for p in range(indptr[i], indptr[i + 1]):
            j = int(indices[p])
            if j != i:
                adj[i].add(j)
                adj[j].add(i)
    return adj


def _md_order_py(n, indptr, indices):
    adj = _adj(n, indptr, indices)
    alive = set(range(n))
    perm = np.zeros(n, np.int32)
    for k in range(n):
        v = min(alive, key=lambda u: len(adj[u] & alive))
        perm[k] = v
        alive.discard(v)
        nbrs = list(adj[v] & alive)
        for a in range(len(nbrs)):
            for b in range(a + 1, len(nbrs)):
                adj[nbrs[a]].add(nbrs[b])
                adj[nbrs[b]].add(nbrs[a])
    return perm


def _symbolic_fill_py(n, indptr, indices, perm):
    adj = _adj(n, indptr, indices)
    alive = set(range(n))
    total = 0
    for k in range(n):
        v = int(perm[k])
        alive.discard(v)
        nbrs = list(adj[v] & alive)
        total += len(nbrs)
        for a in range(len(nbrs)):
            for b in range(a + 1, len(nbrs)):
                adj[nbrs[a]].add(nbrs[b])
                adj[nbrs[b]].add(nbrs[a])
    return total
