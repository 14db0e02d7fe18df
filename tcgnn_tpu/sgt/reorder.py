"""Graph reordering to raise SGT condensation efficiency.

The TC-GNN paper pairs SGT with node reordering (its sibling repos use
Rabbit ordering; ``/root/reference/README.md`` "+Rabbit" variants) so that
rows mapped to the same window share neighbors.  On TPU this matters twice:
fewer TC blocks *and* fewer condensed-gather rows — the gather is per-row
bound, so window-level neighbor sharing is the main lever on power-law
graphs.

Reordering is a graph isomorphism: permute rows+cols of A and the node
features/labels identically; training semantics are unchanged (full-graph
loss is permutation-invariant).  ``reverse_cuthill_mckee`` (scipy) is the
bandwidth-minimizing classic and needs no extra deps.
"""

from __future__ import annotations

import numpy as np


def rcm_permutation(row_pointers, column_index, num_nodes: int) -> np.ndarray:
    """perm[new_id] = old_id via reverse Cuthill-McKee on A + A^T.

    Uses the native C++ BFS implementation when built (~70x faster than
    scipy's on multi-million-edge graphs); scipy is the fallback.
    """
    import scipy.sparse as sp

    indptr = np.asarray(row_pointers, dtype=np.int64)
    indices = np.asarray(column_index, dtype=np.int64)
    data = np.ones(len(indices), dtype=np.int8)
    a = sp.csr_matrix((data, indices, indptr), shape=(num_nodes, num_nodes))
    s = (a + a.T).tocsr()

    from tcgnn_tpu.sgt import native

    if native.available():
        return native.rcm(
            s.indptr.astype(np.int64), s.indices.astype(np.int32)
        )
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    return np.asarray(reverse_cuthill_mckee(s, symmetric_mode=True), dtype=np.int64)


def community_permutation(row_pointers, column_index, num_nodes: int) -> np.ndarray:
    """perm[new_id] = old_id via Rabbit-style community aggregation.

    The ordering the TC-GNN README pairs with SGT ("+Rabbit" variants,
    ``/root/reference/README.md``): single-pass modularity-gain merging with
    dendrogram-DFS ids (native C++, ``sgt.cpp:sgt_community``).  Best on
    power-law / co-purchase graphs where RCM's bandwidth objective has no
    band to find; falls back to RCM when the native library is missing.
    """
    import scipy.sparse as sp

    indptr = np.asarray(row_pointers, dtype=np.int64)
    indices = np.asarray(column_index, dtype=np.int64)
    data = np.ones(len(indices), dtype=np.int8)
    a = sp.csr_matrix((data, indices, indptr), shape=(num_nodes, num_nodes))
    s = (a + a.T).tocsr()

    from tcgnn_tpu.sgt import native

    if native.available():
        return native.community(
            s.indptr.astype(np.int64), s.indices.astype(np.int32)
        )
    return rcm_permutation(row_pointers, column_index, num_nodes)


def permute_csr(row_pointers, column_index, perm: np.ndarray):
    """CSR of P A P^T where new node i = old node perm[i].

    Returns (new_ptr, new_cols, edge_map) with ``edge_map[new_edge] =
    old_edge`` so per-edge vectors can follow the relabeling.
    """
    ptr = np.asarray(row_pointers, dtype=np.int64)
    cols = np.asarray(column_index, dtype=np.int64)
    n = len(ptr) - 1
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n, dtype=np.int64)

    degrees = np.diff(ptr)
    new_degrees = degrees[perm]
    new_ptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(new_degrees, out=new_ptr[1:])

    # For each new row r (old row perm[r]), copy its old edge slice.
    old_starts = ptr[perm]
    edge_map = np.empty(len(cols), dtype=np.int64)
    idx_within = np.arange(len(cols), dtype=np.int64) - np.repeat(
        new_ptr[:-1], new_degrees
    )
    edge_map = np.repeat(old_starts, new_degrees) + idx_within
    new_cols_unsorted = inv[cols[edge_map]]

    # Keep each row's columns sorted (CSR convention the SGT pass expects).
    # Single combined-key argsort (row * n + col fits int64) is ~2x faster
    # than a two-key lexsort on multi-million-edge graphs.
    row_of_new_edge = np.repeat(np.arange(n, dtype=np.int64), new_degrees)
    order = np.argsort(
        row_of_new_edge * np.int64(n) + new_cols_unsorted, kind="stable"
    )
    return (
        new_ptr.astype(np.int32),
        new_cols_unsorted[order].astype(np.int32),
        edge_map[order],
    )


def reorder_dataset(ds, method: str = "rcm"):
    """Permute a GraphDataset in place (graph + features + labels).

    Returns the permutation used (perm[new] = old); ``None`` method is a
    no-op.
    """
    if method in (None, "none"):
        return None
    if method == "rcm":
        perm = rcm_permutation(ds.row_pointers, ds.column_index, ds.num_nodes)
    elif method == "community":
        perm = community_permutation(
            ds.row_pointers, ds.column_index, ds.num_nodes
        )
    else:
        raise ValueError(f"unknown reorder method {method!r}")
    new_ptr, new_cols, _ = permute_csr(ds.row_pointers, ds.column_index, perm)
    ds.row_pointers = new_ptr
    ds.column_index = new_cols
    ds.x = np.asarray(ds.x)[perm]
    ds.y = np.asarray(ds.y)[perm]
    for m in ("train_mask", "val_mask", "test_mask"):
        if getattr(ds, m, None) is not None:
            setattr(ds, m, np.asarray(getattr(ds, m))[perm])
    return perm
