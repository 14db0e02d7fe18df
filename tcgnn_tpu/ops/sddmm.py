"""Pallas MXU SDDMM over SGT-tiled graphs (per-edge dot-product scores).

TPU-native re-design of ``sddmm_forward_cuda_kernel``
(/root/reference/TCGNN_conv/TCGNN_kernel.cu:584-728): the GPU kernel tiles a
window's 16 own feature rows against its condensed neighbors' rows, runs
WMMA ``X @ Yᵀ`` into a 16x16 score tile, and scatters scores to edges via an
index matrix (lines 654-663, 719-726).

TPU dataflow, sharing the SpMM's uniform edge-chunk layout:

* grid = (edge_chunks, d_tiles), d fastest so each chunk's score vector
  accumulates across feature tiles in VMEM;
* per chunk, per-edge row/col features are *selected* with one-hot MXU
  contractions instead of a scatter matrix:

      Ea = onehot(r)ᵀ-contract Xa_window   # [EC, DT]  row-side features
      Eb = onehot(c)ᵀ-contract Xg_block    # [EC, DT]  col-side features
      scores_chunk += rowsum(Ea * Eb)      # VPU

* output is per-chunk-slot scores ``[n_chunks, EC]``; ``meta.edge_perm``
  gathers them back to CSR edge order (the GPU's scatter epilogue, lines
  719-726, done as an XLA gather).

Generalized to two input matrices (xa for edge rows, xb for edge columns):
``xa == xb`` gives the reference op; ``xa = dY, xb = X`` gives the exact
edge-weight gradient of the weighted SpMM, which the reference approximates
ad hoc (gnn_conv.py:150-158).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tcgnn_tpu.config import TileConfig
from tcgnn_tpu.sgt.translate import JaxSGTMeta
from tcgnn_tpu.ops.spmm import _mxu_precision, _round_up, default_interpret


def _sddmm_kernel(
    blk_ref, win_ref,
    r_ref, c_ref, xa_ref, xg_ref,
    o_ref,
    *,
    blk_h: int,
    blk_w: int,
    compute_dtype,
):
    d = pl.program_id(1)
    ec = r_ref.shape[-1]

    r = r_ref[0]  # [1, EC]
    c = c_ref[0]  # [1, EC]

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (blk_h, ec), 0)
    rmat = (row_iota == r).astype(compute_dtype)  # [blk_h, EC]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (blk_w, ec), 0)
    cmat_t = (col_iota == c).astype(compute_dtype)  # [blk_w, EC]

    ea = jax.lax.dot_general(
        rmat,
        xa_ref[:].astype(compute_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mxu_precision(compute_dtype),
    )  # [EC, DT]
    eb = jax.lax.dot_general(
        cmat_t,
        xg_ref[:].astype(compute_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mxu_precision(compute_dtype),
    )  # [EC, DT]

    partial_scores = jnp.sum(ea * eb, axis=1)[None, :]  # [1, EC]

    @pl.when(d == 0)
    def _():
        o_ref[0] = partial_scores

    @pl.when(d != 0)
    def _():
        o_ref[0] += partial_scores


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_windows", "interpret", "d_tile"),
)
def _sddmm_padded(
    xa: jnp.ndarray,
    xb: jnp.ndarray,
    col_ids: jnp.ndarray,
    chunk_r: jnp.ndarray,
    chunk_c: jnp.ndarray,
    chunk_block: jnp.ndarray,
    chunk_window: jnp.ndarray,
    *,
    cfg: TileConfig,
    num_windows: int,
    interpret: bool,
    d_tile: int = 128,
) -> jnp.ndarray:
    """Returns chunk-layout scores [n_chunks, EC] f32."""
    n_chunks, ec = chunk_r.shape
    d_pad = xa.shape[1]
    assert d_pad % d_tile == 0
    n_dtiles = d_pad // d_tile

    # Row side: pad xa to the window grid; col side: condensed gather of xb.
    xa_pad = jnp.pad(xa, ((0, num_windows * cfg.blk_h - xa.shape[0]), (0, 0)))
    xg = jnp.take(xb, col_ids, axis=0, fill_value=0)

    # Mosaic-legal blocks: per-chunk metadata and scores as [Cn, 1, EC].
    chunk_r = chunk_r[:, None, :]
    chunk_c = chunk_c[:, None, :]

    kernel = functools.partial(
        _sddmm_kernel,
        blk_h=cfg.blk_h,
        blk_w=cfg.blk_w,
        compute_dtype=cfg.compute_dtype,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks, n_dtiles),
        in_specs=[
            pl.BlockSpec((1, 1, ec), lambda i, d, blk, win: (i, 0, 0)),
            pl.BlockSpec((1, 1, ec), lambda i, d, blk, win: (i, 0, 0)),
            pl.BlockSpec(
                (cfg.blk_h, d_tile), lambda i, d, blk, win: (win[i], d)
            ),
            pl.BlockSpec(
                (cfg.blk_w, d_tile), lambda i, d, blk, win: (blk[i], d)
            ),
        ],
        out_specs=pl.BlockSpec((1, 1, ec), lambda i, d, blk, win: (i, 0, 0)),
    )

    flops = 2 * n_dtiles * n_chunks * ec * d_tile * (cfg.blk_w + cfg.blk_h)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_chunks, 1, ec), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(xg.size + xa_pad.size) * 4 + chunk_r.size * 8 + n_chunks * ec * 4,
            transcendentals=0,
        ),
    )(
        chunk_block,
        chunk_window,
        chunk_r,
        chunk_c,
        xa_pad,
        xg,
    )


# ---------------------------------------------------------------------------
# Window-segment streamed chunk SDDMM (sgt/stream.py): scan one compiled
# chunk kernel over S stacked segments — the SpMM counterpart lives in
# ops/spmm.py (`spmm_tc_streamed`); see the design note there.
# ---------------------------------------------------------------------------
@functools.partial(
    jax.jit, static_argnames=("cfg", "wseg", "interpret", "d_tile")
)
def _sddmm_streamed_padded(
    xa: jnp.ndarray,
    xb: jnp.ndarray,
    seg_col_ids: jnp.ndarray,
    seg_r: jnp.ndarray,
    seg_c: jnp.ndarray,
    seg_block: jnp.ndarray,
    seg_window: jnp.ndarray,
    *,
    cfg: TileConfig,
    wseg: int,
    interpret: bool,
    d_tile: int = 128,
) -> jnp.ndarray:
    """Streamed chunk SDDMM; returns stacked scores [S, C_max, EC] f32.

    The row side feeds each step the segment's own window rows (a
    contiguous dynamic slice of the padded xa — windows are consecutive
    row ranges, so no gather); the column side re-gathers the segment's
    condensed slab inside the step.
    """
    num_segments = seg_r.shape[0]
    rows = wseg * cfg.blk_h
    xa_full = jnp.pad(xa, ((0, num_segments * rows - xa.shape[0]), (0, 0)))

    def step(s, seg):
        col_ids, r, c, blk, win = seg
        xa_seg = jax.lax.dynamic_slice(
            xa_full, (s * rows, 0), (rows, xa_full.shape[1])
        )
        scores = _sddmm_padded(
            xa_seg, xb, col_ids, r, c, blk, win,
            cfg=cfg, num_windows=wseg, interpret=interpret, d_tile=d_tile,
        )
        return s + 1, scores[:, 0, :]

    _, outs = jax.lax.scan(
        step, 0, (seg_col_ids, seg_r, seg_c, seg_block, seg_window)
    )
    return outs


def sddmm_tc_streamed(
    xa: jnp.ndarray,
    smeta,
    xb: jnp.ndarray | None = None,
    *,
    interpret: bool | None = None,
    d_tile: int = 128,
) -> jnp.ndarray:
    """Streamed SDDMM: per-edge ``e_(i,j) = <xa[i], xb[j]>`` in CSR order.

    ``smeta`` is a :class:`tcgnn_tpu.sgt.stream.StreamedJaxMeta`; same
    semantics as :func:`sddmm_tc` (TCGNN_kernel.cu:584-728) past the
    one-shot chunk kernels' SMEM/HBM ceilings.
    """
    if interpret is None:
        interpret = default_interpret()
    if xb is None:
        xb = xa
    n, d = xa.shape
    d_pad = _round_up(max(d, 1), d_tile)
    if d_pad != d:
        xa = jnp.pad(xa, ((0, 0), (0, d_pad - d)))
        xb = jnp.pad(xb, ((0, 0), (0, d_pad - d)))
    scores = _sddmm_streamed_padded(
        xa, xb,
        smeta.seg_col_ids, smeta.seg_r, smeta.seg_c,
        smeta.seg_block, smeta.seg_window,
        cfg=smeta.config, wseg=smeta.wseg, interpret=interpret, d_tile=d_tile,
    )
    return _extract_rows(scores, smeta.edge_perm)


def _extract_rows(scores2d, flat_idx):
    """Per-edge extraction from a 2-D score array: lane-row gather + fused
    one-hot select (XLA elementwise gather runs ~0.14 G elem/s; row
    gathers ~3x faster — see sddmm_tc_dense)."""
    w = scores2d.shape[-1]
    r = scores2d.reshape(-1, w)[flat_idx // w]
    onehot = (flat_idx % w)[:, None] == jnp.arange(w)[None, :]
    return jnp.sum(jnp.where(onehot, r, 0.0), axis=1)


# ---------------------------------------------------------------------------
# Dense-tile path: score tiles S_b = Xa[window(b)] @ Xg[b]^T computed as one
# MXU matmul per (block, d-tile); per-edge scores gathered straight out of
# the flat score tiles via meta.edge_pos (the GPU scatter epilogue,
# TCGNN_kernel.cu:719-726, as a single XLA gather).
# ---------------------------------------------------------------------------
def _sddmm_grouped_kernel(
    gwin_ref, xa_ref, xg_ref, o_ref, *, blk_h, blk_w, group, compute_dtype
):
    d = pl.program_id(1)
    xa = xa_ref[:].astype(compute_dtype)  # [blk_h, d_blk] — the group's window
    for k in range(group):
        s = jax.lax.dot_general(
            xa,
            xg_ref[k * blk_w : (k + 1) * blk_w, :].astype(compute_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mxu_precision(compute_dtype),
        )  # [blk_h, blk_w]

        @pl.when(d == 0)
        def _():
            o_ref[k] = s.astype(o_ref.dtype)

        @pl.when(d != 0)
        def _():
            o_ref[k] += s.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_windows", "interpret", "d_tile", "out_dtype"),
)
def _sddmm_dense_padded(
    xa: jnp.ndarray,
    xb: jnp.ndarray,
    col_ids: jnp.ndarray,
    block_window: jnp.ndarray,
    *,
    cfg: TileConfig,
    num_windows: int,
    interpret: bool,
    d_tile: int = 128,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Returns flat score tiles [B, blk_h, blk_w] in ``out_dtype``.

    Grouped like the SpMM: each grid step owns ``block_group`` consecutive
    blocks of ONE window (SGT pads per-window block counts), so the window's
    feature rows ride a scalar-prefetched index map and every DMA is large.
    d is the inner grid dim; score tiles accumulate in VMEM.
    """
    n_blocks = block_window.shape[0]
    d = xa.shape[1]
    group = cfg.block_group
    assert n_blocks % group == 0, (n_blocks, group)
    # Narrow feature dims stay narrow (see _spmm_dense_padded).
    if d >= d_tile:
        d_pad, d_blk = _round_up(d, d_tile), d_tile
    else:
        d_pad = d_blk = _round_up(max(d, 1), 8)
    n_dtiles = d_pad // d_blk
    # Sub-f32 tiles accumulate across d-tiles only when n_dtiles > 1; keep
    # f32 in that case so the VMEM accumulation stays exact.
    if n_dtiles > 1:
        out_dtype = jnp.float32

    if cfg.compute_dtype == jnp.bfloat16:
        xa = xa.astype(jnp.bfloat16)
        xb = xb.astype(jnp.bfloat16)
    gwin = block_window[::group]

    xa_pad = jnp.pad(
        xa, ((0, num_windows * cfg.blk_h - xa.shape[0]), (0, d_pad - d))
    )
    xg = jnp.take(xb, col_ids, axis=0, fill_value=0)
    if d_pad != d:
        xg = jnp.pad(xg, ((0, 0), (0, d_pad - d)))

    kernel = functools.partial(
        _sddmm_grouped_kernel,
        blk_h=cfg.blk_h,
        blk_w=cfg.blk_w,
        group=group,
        compute_dtype=cfg.compute_dtype,
    )
    flops = 2 * n_dtiles * n_blocks * cfg.blk_h * cfg.blk_w * d_blk
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks // group, n_dtiles),
        in_specs=[
            pl.BlockSpec((cfg.blk_h, d_blk), lambda b, d, win: (win[b], d)),
            pl.BlockSpec((group * cfg.blk_w, d_blk), lambda b, d, win: (b, d)),
        ],
        out_specs=pl.BlockSpec(
            (group, cfg.blk_h, cfg.blk_w), lambda b, d, win: (b, 0, 0)
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks, cfg.blk_h, cfg.blk_w), out_dtype
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(xg.size + xa_pad.size) * xg.dtype.itemsize
            + n_blocks * cfg.blk_h * cfg.blk_w * 4,
            transcendentals=0,
        ),
    )(gwin, xa_pad, xg)



def sddmm_tc_dense(
    xa: jnp.ndarray,
    meta: JaxSGTMeta,
    xb: jnp.ndarray | None = None,
    *,
    interpret: bool | None = None,
    d_tile: int = 128,
) -> jnp.ndarray:
    """Dense-tile SDDMM: per-edge ``e = <xa[row_e], xb[col_e]>`` (CSR order)."""
    if interpret is None:
        interpret = default_interpret()
    if xb is None:
        xb = xa
    tiles = _sddmm_dense_padded(
        xa,
        xb,
        meta.col_ids,
        meta.block_window,
        cfg=meta.config,
        num_windows=meta.num_windows,
        interpret=interpret,
        d_tile=d_tile,
    )
    # Per-edge extraction as a LANE-ROW gather + fused one-hot select:
    # XLA's elementwise gather runs ~0.14 G elem/s while 128-lane row
    # gathers run ~3x faster even from the full tile array (amazon0601:
    # 55.7 -> 32.7 ms for the whole SDDMM, measured; the tile compute
    # itself is 6.9 ms).  The select fuses into the gather consumer — no
    # [E, 128] materialization.
    flat = tiles.reshape(-1, meta.config.blk_w)
    rows = meta.edge_pos // meta.config.blk_w
    lane = meta.edge_pos % meta.config.blk_w
    r = flat[rows]
    onehot = lane[:, None] == jnp.arange(meta.config.blk_w)[None, :]
    return jnp.sum(jnp.where(onehot, r, 0.0), axis=1)


def sddmm_tc(
    xa: jnp.ndarray,
    meta: JaxSGTMeta,
    xb: jnp.ndarray | None = None,
    *,
    interpret: bool | None = None,
    d_tile: int = 128,
) -> jnp.ndarray:
    """Tensor-core SDDMM: per-edge ``e_(i,j) = <xa[i], xb[j]>`` in CSR order.

    ``xb=None`` means ``xb = xa`` (the reference op, ``sddmm_forward``,
    TCGNN.cpp:126-150).
    """
    if interpret is None:
        interpret = default_interpret()
    if xb is None:
        xb = xa
    n, d = xa.shape
    d_pad = _round_up(max(d, 1), d_tile)
    if d_pad != d:
        xa = jnp.pad(xa, ((0, 0), (0, d_pad - d)))
        xb = jnp.pad(xb, ((0, 0), (0, d_pad - d)))

    scores = _sddmm_padded(
        xa,
        xb,
        meta.col_ids,
        meta.chunk_r,
        meta.chunk_c,
        meta.chunk_block,
        meta.chunk_window,
        cfg=meta.config,
        num_windows=meta.num_windows,
        interpret=interpret,
        d_tile=d_tile,
    )
    return _extract_rows(scores, meta.edge_perm)
