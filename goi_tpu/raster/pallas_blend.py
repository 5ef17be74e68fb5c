"""Pallas TPU kernels for the tiled alpha blend (forward + backward).

TPU-native replacement for renderCUDA forward/backward
(ref:cuda_rasterizer/forward.cu:261-386, backward.cu:413-625). One grid
program per 16x16 tile; instance data arrives pre-gathered and
tile-segmented (K-aligned segments from bin_splats(align=K)) as one
FEATURE-major (D_pad, N_inst+K) matrix in HBM, so every chunk is ONE
contiguous-minor (D_pad, K) DMA — the TPU answer to the CUDA kernel's
shared-memory batch fetches. (A row-major input layout measured SLOWER
overall — see _pack_impl.) Gradients go the other way: the backward
kernel flips each chunk's grads to ROW-major (K, DOUT) on a VMEM tile
before the write-out, so the instance->Gaussian reduction consumes
whole rows and neither side ever pays an instance-scale (D, M)->(M, D)
transpose (~3 ms at M ~ 500k).

Per chunk of K=128 instances (all (256, K) VPU math + MXU matmuls):
  power/alpha as in the CUDA kernel (0.99 clamp, 1/255 skip, T<1e-4
  sticky stop); transmittance via log-space cumulative sums computed as
  a triangular-matrix matmul (MXU) — no sequential scan;
  accumulation   acc += W @ F_out           (256xK @ Kx14)
  early exit     while max_pixel T >= 1e-4

Backward re-walks the chunks front-to-back (the CUDA kernel walks
back-to-front with atomics; front-to-back + suffix-from-total gives the
identical math with deterministic per-instance writes):
  dL/dalpha_i = T_i (f_i . g) - R_i / (1 - alpha_i),
  R_i = TOTAL - prefix_i,  TOTAL = sum_j w_j (f_j . g) + g_T * T_final
then chains to mean2d/conic/opacity exactly as
ref:cuda_rasterizer/backward.cu:598-621. Per-instance grads are written
to disjoint K-aligned slices (no atomics, bit-deterministic), and the
caller segment-sums instances -> Gaussians.

Feature layout within a row (D = 7 + 3 + S):
  0:x 1:y 2:conic_a 3:conic_b 4:conic_c 5:opacity 6..8:rgb
  9..9+S-1:semantics 6+3+S:depth  [chunked layout: 6+4+S:gaussian id]
Output row layout (OUTC = 14 two-padded to 16):
  0..2 color accum, 3..3+S-1 semantics, 3+S depth, 3+S+1 T_final

Round-3 CHUNKED layout (bin_splats_chunked, the default): tile segments
are contiguous in the sorted stream (no K-aligned gaps); every kernel
floor-walks the K-aligned window containing `start` and masks lanes
outside [start, end). The backward/trace write FEATURE-major NARROW
buffers ((d_pad, chunks*K): K-lane tile-aligned slices — Mosaic rejects
partial-lane (<128) slices, ruling out narrow row-major tiles — and no
per-chunk flip) with each instance's Gaussian id transported as one
more feature row; the caller pays one narrow transpose, then reduces
via the permutation chain ('chain', default: invert the sort lazily,
gather rows to expansion order, MXU prefix sums, boundary differences)
or one transported-key segment-sum ('scatter'). XLA's multi-column
scatter is column-serial (~12 ms/col at 2.5M rows), which makes the
chain ~2.5x faster at production scale.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from goi_tpu.raster.binning import Binning
from goi_tpu.raster.preprocess import TILE, Splats
from goi_tpu.raster.reference import ALPHA_CLAMP, ALPHA_MIN, T_EPS

K = 256          # instances per chunk (2x the lane width: fewer
#                  chunk iterations / DMAs; the lane-cumsum stays
#                  linear in K via SUB-blocked tri matmuls)
SUB = 128        # tri-matmul block (the MXU lane width)
PIX = TILE * TILE

CUMPROD_SCAN = False  # lane cumprod via Hillis-Steele roll-multiply
#                      scan instead of exp(cumsum(log q))


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


DOUT = 128  # row-major instance-grad rows (128-lane DMA alignment)

GATHER_LANES = 64  # row width for instance-scale XLA gathers: >= 64
#                    lanes hits the fast row-gather path (~15 ns/row at
#                    2.4M rows); 16-32 lanes measured ~2x slower


# In-KERNEL MXU precision for the blend/trace/backward matmuls.
# HIGHEST = true fp32 (6-pass bf16 decomposition); HIGH = bf16_3x
# (~fp32-grade for these operand ranges at half the MXU passes);
# DEFAULT = single bf16 pass (the rounds-1/2 silent-truncation bug).
# Default HIGHEST: the CUDA reference is fully fp32 (PARITY.md
# deviation 10). examples/profile_precision.py sweeps this knob and
# records the measured cost/error per matmul group; the reduce-side
# tri matmuls (_blocked_segment_reduce) stay pinned at HIGHEST
# regardless (accuracy-critical, ~1 ms at 2.4M rows).
MXU_PRECISION = jax.lax.Precision.HIGHEST


def _split3(x):
    """Three-chunk bf16 mantissa decomposition of fp32 x:
    x == x1 + x2 + x3 exactly (8+8+8 >= 24 mantissa bits), every chunk
    bf16-representable."""
    x1 = x.astype(jnp.bfloat16).astype(jnp.float32)
    r = x - x1
    x2 = r.astype(jnp.bfloat16).astype(jnp.float32)
    return x1, x2, r - x2


def _dot_e(x, e, dims, *, split_rhs=False):
    """fp32-grade dot where ONE operand (e) is bf16-EXACT (the 0/1 tri
    matrices, the quarter-integer p6 moment basis, the 0/1 hit masks):
    split only the general operand into three bf16 mantissa chunks and
    run three single-pass (DEFAULT) MXU products — each pass is exact,
    the fp32 accumulation matches Precision.HIGHEST at half the MXU
    passes (HIGHEST decomposes BOTH operands: 6 passes). Falls back to
    one plain pass when MXU_PRECISION is DEFAULT (the profiling knob).
    split_rhs=True splits the second argument instead (call with
    x=exact matrix)."""
    if MXU_PRECISION == jax.lax.Precision.DEFAULT:
        return jax.lax.dot_general(
            x, e, dims, precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)
    d = partial(jax.lax.dot_general, dimension_numbers=dims,
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
    if split_rhs:
        e1, e2, e3 = _split3(e)
        return d(x, e1) + d(x, e2) + d(x, e3)
    x1, x2, x3 = _split3(x)
    return d(x1, e) + d(x2, e) + d(x3, e)


def _pack_impl(mean2d, conic, opacity, color, semantics, depth, gid,
               with_gid: bool = False):
    """Gather per-instance features, feature-major: (D_pad, Npad+K).
    Sentinel instances (gid < 0) become all-zero columns (opacity 0 =>
    alpha 0 < 1/255 => skipped).

    Built as ONE contiguous row-gather of a per-Gaussian feature matrix
    followed by a transpose — orders of magnitude cheaper on TPU than
    per-column gathers. Feature-major is forced by Mosaic: manual DMA
    slices must be 128-aligned along the minor dim, so the kernels can
    only read (D_pad, K)-shaped chunks of a feature-major matrix (a
    row-major (M, 24) layout is not chunk-sliceable, and padding rows
    to 128 lanes measured SLOWER overall — the 4x pack/cumsum traffic
    outweighs the transposes it saves).

    with_gid=True (chunked layout) appends the Gaussian id itself as
    one more feature ROW (f32-exact below 2^24): the backward/trace
    kernels copy it into their per-instance output rows, so the
    instance->Gaussian reduction gets its keys transported BY the
    kernel instead of via an instance-scale index gather."""
    s_dim = semantics.shape[-1]
    n = opacity.shape[0]
    d = 7 + 3 + s_dim
    d_tot = d + (1 if with_gid else 0)
    d_pad = d_tot + ((-d_tot) % 8)  # Mosaic HBM sublane tiling
    parts = [
        mean2d,                          # 2
        conic,                           # 3
        opacity[:, None],                # 1
        color,                           # 3
        semantics,                       # S
        depth[:, None],                  # 1
    ]
    if with_gid:
        # the Gaussian's own id as a feature (f32-exact below 2^24) —
        # rides the same per-Gaussian row gather
        parts.append(jnp.arange(n, dtype=jnp.float32)[:, None])
    parts.append(jnp.zeros((n, d_pad - d_tot), opacity.dtype))
    per_gauss = jnp.concatenate(parts, axis=1)       # (N_gauss, d_pad)
    ok = gid >= 0
    inst = per_gauss[jnp.maximum(gid, 0)]            # (N_inst, d_pad)
    inst = jnp.where(ok[:, None], inst, 0.0)
    feat = inst.T                                     # (d_pad, N_inst)
    # +K zero columns so the last (clamped) segment\'s chunk walk stays
    # in bounds
    return jnp.pad(feat, ((0, 0), (0, K)))


def _reduce_instance_grads(g, gid, n_gauss, s_dim):
    """Instance grads (ROW-major (Npad+K, DOUT), straight from the bwd
    kernel) -> per-Gaussian grads, as ONE deterministic segment-sum
    scatter keyed by the tile-sorted Gaussian ids (XLA TPU scatters
    execute without atomics, so this is bit-reproducible — the
    deterministic replacement for the CUDA backward\'s atomicAdd
    pixel->Gaussian reduction, ref:cuda_rasterizer/backward.cu:565-621).

    Measured on-chip at M ~ 350k: this direct scatter (7.8 ms) beats
    the presort gather+cumsum+segment-diff chain (8.3 ms) that round 1
    used, and it needs none of the presort bookkeeping (one fewer
    M-sized scatter in binning). Both are random-access latency-bound
    (~15-20 ns/row) — the TPU floor for crossing the tile sort.
    Sentinel rows (gid < 0: alignment gaps and the +K pad) are masked
    here, so uninitialized kernel-output rows beyond the last segment
    never leak (jnp.where selects, NaNs do not propagate).

    The kernel emits row-major grads precisely so this reduction
    consumes whole rows: a (D, M) -> (M, D) transpose at M ~ 500k
    costs ~3 ms of pure lane shuffling on TPU."""
    d = 7 + 3 + s_dim
    gt = g[:-K, :d]                               # (N_inst, d)
    ok = gid >= 0
    acc = jax.ops.segment_sum(
        jnp.where(ok[:, None], gt, 0.0),
        jnp.where(ok, gid, n_gauss),
        num_segments=n_gauss + 1)[:n_gauss]
    return (acc[:, 0:2], acc[:, 2:5], acc[:, 5], acc[:, 6:9],
            acc[:, 9:9 + s_dim], acc[:, 9 + s_dim])


def _reduce_instance_grads_sorted(g, perm, n_gauss, s_dim):
    """Sorted-key alternative to _reduce_instance_grads: gather the
    row-major instance grads into EXPANSION-stream order (stream_pos,
    one random (M, d) row gather) where the Gaussian ids are monotone
    (gaussian-index-major expansion), then one segment-sum with
    indices_are_sorted=True — a sequential segmented reduce instead of
    a random scatter-add. Selected by RasterConfig(reduce='sorted');
    which side wins is a measured, hardware-level tradeoff (random
    GATHER + sorted reduce vs random SCATTER-ADD).

    Dropped instances (budget overflow) and the padding tail carry the
    2^30 stream_pos sentinel: their rows are zeroed but their KEYS stay
    the true (monotone) Gaussian ids, so the sorted hint is never
    violated — summing zeros is harmless."""
    stream_pos, stream_gid = perm
    d = 7 + 3 + s_dim
    n_rows = g.shape[0]                       # n_inst + K
    ok = stream_pos < (n_rows - K)
    idx = jnp.where(ok, stream_pos, 0)
    rows = g.at[idx].get(mode="promise_in_bounds")[:, :d]
    rows = jnp.where(ok[:, None], rows, 0.0)
    acc = jax.ops.segment_sum(rows, stream_gid, num_segments=n_gauss,
                              indices_are_sorted=True)
    return (acc[:, 0:2], acc[:, 2:5], acc[:, 5], acc[:, 6:9],
            acc[:, 9:9 + s_dim], acc[:, 9 + s_dim])


CUMSUM_BLOCK = 512   # rows per prefix block: 2048 measured only ~1 ms
#                      faster at 1M while quadrupling the block-local
#                      rounding bound the parity bars are set against


def _prefix_kernel(rows_ref, okf_ref, inner_ref, tot_ref, *, nb, blk,
                   masked):
    """One (blk, d) block per grid step: masked block-LOCAL exclusive
    row-prefix (strict-lower tri matmuls in SUB chunks with a carried
    chunk total) + the block total. Grid step nb writes the extra
    all-zero block that covers boundary lookups at p == nb*blk."""
    i = pl.program_id(0)

    tot_ref[:, :] = jnp.zeros(tot_ref.shape, jnp.float32)

    @pl.when(i == nb)
    def _():
        inner_ref[:, :] = jnp.zeros(inner_ref.shape, jnp.float32)

    @pl.when(i < nb)
    def _():
        x = rows_ref[:, :]
        if masked:
            # invalid rows (dropped/truncated instances gathered from
            # row 0) zeroed here instead of a full-buffer XLA select
            x = x * okf_ref[:, :]
        ri = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1)
        tril = (ri > ci).astype(jnp.float32)
        carry = jnp.zeros((1, x.shape[1]), jnp.float32)
        outs = []
        for j in range(blk // SUB):
            xc = x[j * SUB:(j + 1) * SUB, :]
            pc = _dot_e(tril, xc, (((1,), (0,)), ((), ())),
                        split_rhs=True) + carry
            outs.append(pc)
            carry = pc[SUB - 1:SUB, :] + xc[SUB - 1:SUB, :]
        inner_ref[:, :] = jnp.concatenate(outs, axis=0)
        tot_ref[0:1, :] = carry


def _prefix_blocks(rows, okf, blk):
    """rows (nb*blk, d) [+ optional (nb*blk, 1) f32 mask] ->
    (block-local exclusive prefixes ((nb+1)*blk, d) with a trailing
    zero block, block totals (nb, d))."""
    nbblk, d = rows.shape
    nb = nbblk // blk
    masked = okf is not None
    operands = [rows] + ([okf] if masked else [])
    in_specs = [pl.BlockSpec((blk, d),
                             lambda i: (jnp.minimum(i, nb - 1), 0))]
    if masked:
        in_specs.append(pl.BlockSpec(
            (blk, 1), lambda i: (jnp.minimum(i, nb - 1), 0)))
    kern = partial(_prefix_kernel, nb=nb, blk=blk, masked=masked)
    if not masked:
        def kern(rows_ref, inner_ref, tot_ref):
            return _prefix_kernel(rows_ref, None, inner_ref, tot_ref,
                                  nb=nb, blk=blk, masked=False)
    inner, tot = pl.pallas_call(
        kern,
        grid=(nb + 1,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((blk, d), lambda i: (i, 0)),
            # Mosaic needs >= 8 sublanes per block: row 0 of each
            # 8-row group carries the total, rows 1-7 are zero
            pl.BlockSpec((8, d), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(((nb + 1) * blk, d), jnp.float32),
            jax.ShapeDtypeStruct(((nb + 1) * 8, d), jnp.float32),
        ],
        interpret=_interpret(),
    )(*operands)
    return inner, tot[:nb * 8:8]


def _blocked_segment_reduce(rows, bounds, d, okf=None):
    """Per-segment sums of expansion-ordered rows with BLOCK-LOCAL
    error scaling. rows: (m, d) in expansion (Gaussian-major) order;
    bounds: (n_gauss+1,) non-decreasing segment boundaries already
    clamped to m. Returns (n_gauss, d) segment sums.

    Numerics (round-4 fix of the chain-reduce parity failure): the
    round-3 version folded a GLOBAL cumsum of block totals into the
    per-block prefixes and read each segment as the difference of two
    boundary values of that global prefix — so every boundary carried
    absolute rounding ~ eps * |global prefix| (growing with the stream)
    and tiny per-Gaussian sums inherited it (measured 5.2e-4 abs on a
    400-Gaussian scene, failing its own 5e-4 parity bar). Here no
    global-magnitude quantity is ever materialized:

      seg(g) = L[p_{g+1}] - L[p_g] + sum_{b in [p_g//B, p_{g+1}//B)} tot[b]

    with L the BLOCK-LOCAL exclusive prefix (strict-lower tri matmul on
    the MXU at HIGHEST, error ~ eps * block magnitude, B=512 rows) and
    the whole-block term a segment-sum of block totals keyed by the
    unique Gaussian whose segment contains the block (error ~ eps *
    |segment sum| * blocks-in-segment — RELATIVE to the segment's own
    magnitude). Identity check (segment spanning blocks): L[pb] sums
    the tail rows inside block pb//B, -L[pa] cancels the head of block
    pa//B against its full tot, interior blocks enter via tot. All
    sums remain deterministic (the replacement for the CUDA backward's
    atomicAdd, ref:cuda_rasterizer/backward.cu:565-621); order is
    blocked-prefix, PARITY.md deviation 3's class, with error bounded
    by block/segment — not global — magnitude."""
    m, n_gauss = rows.shape[0], bounds.shape[0] - 1
    # production budgets are K=256-aligned, so the larger block divides
    # exactly; the pad (a full-buffer copy in XLA) only triggers for
    # arbitrary test sizes
    blk = next(b for b in (CUMSUM_BLOCK, 256, SUB) if m % b == 0
               or b == SUB)
    if m % blk:
        rows = jnp.pad(rows, ((0, -m % blk), (0, 0)))
        if okf is not None:
            okf = jnp.pad(okf, ((0, -m % blk), (0, 0)))
    nb = rows.shape[0] // blk
    # Block-local exclusive prefixes + block totals in ONE pallas pass
    # (in XLA the einsum lowered to a convolution sandwiched between two
    # full-buffer 3-D layout copies, the ok-mask was a separate 600 MB
    # select, and the appended zero block forced a whole-buffer pad copy
    # — ~13 ms of glue at 2.4M rows for 2.6 ms of MXU work; the kernel
    # folds mask+prefix+tot and writes the zero block in its last grid
    # step)
    inner_flat, tot = _prefix_blocks(rows, okf, blk)
    p = jnp.minimum(bounds, m)                          # (n_gauss+1,)
    if d < GATHER_LANES:
        # >= 64-lane rows hit XLA's fast row-gather path (see
        # _reduce_transported_chain); guard covers d >= GATHER_LANES
        # (sem_dim > 54), where the rows are already wide enough
        inner_g = jnp.pad(inner_flat,
                          ((0, 0), (0, GATHER_LANES - d)))
        lb = jax.lax.optimization_barrier(
            inner_g.at[p].get(mode="promise_in_bounds",
                              indices_are_sorted=True))[:, :d]
    else:
        lb = inner_flat.at[p].get(mode="promise_in_bounds",
                                  indices_are_sorted=True)
    # whole blocks [p_g//B, p_{g+1}//B) -> Gaussian g: block b belongs
    # to the unique g with q[g] <= b < q[g+1] (empty for q[g]==q[g+1]);
    # blocks past the last boundary land on the n_gauss sentinel row
    q = p // blk
    gb = jnp.searchsorted(
        q, jnp.arange(nb, dtype=q.dtype), side="right"
    ).astype(jnp.int32) - 1
    blocksum = jax.ops.segment_sum(
        tot, jnp.clip(gb, 0, n_gauss),
        num_segments=n_gauss + 1)[:n_gauss]
    return lb[1:] - lb[:-1] + blocksum


def _prefix_boundary_kernel(glo_ref, rows_ref, ind_ref, okf_ref,
                            lba_ref, lbb_ref, tot_ref, lbscr, sem, *,
                            nb, blk, d, masked):
    """Fused block prefix + BOUNDARY COMPACTION (round 5): one grid
    step computes a block's masked exclusive row-prefix (as
    _prefix_kernel) and immediately compacts the prefix values at the
    block's segment boundaries — rank-one-hot @ L on the MXU — then
    DMAs the compacted (blk, 128) tile to lb_ref at the block's first
    boundary index. This removes the full inner-prefix HBM round trip
    AND the 1M-row boundary gather (~11.7 ms at the 1M headline) that
    _blocked_segment_reduce pays.

    Correctness of the overlapping writes: boundary VALUES occupy
    [g0_b, g1_b) — disjoint and contiguous across blocks; rows past
    cnt are written 0 and then overwritten by the NEXT block's tile
    (consecutive DMAs are serialized: wait(b-1) before start(b), which
    costs nothing since DMA b-1 completes under block b's compute).
    Rows never written (after the last block) satisfy p >= m and are
    masked to zero by the caller — which is also their correct
    BLOCK-LOCAL prefix value (the whole-block tots supply the rest;
    see _blocked_segment_reduce's identity).

    ind is the dense segment-start indicator (ind[r] = 1 iff r ==
    bounds[g] for some g; dense streams make it bijective below m) —
    derived by the caller from the binning's g_stream by one diff.
    lb rows past the last block's boundaries stay UNWRITTEN (garbage);
    the caller masks every row >= g_m to zero, so no zero-init alias
    is needed (jnp.where selects — garbage NaNs do not propagate)."""
    b = pl.program_id(0)
    slot = jax.lax.rem(b, 2)

    @pl.when(b == 0)
    def _():
        # constant-zero pad lanes (d..128) of both scratch slots
        lbscr[0, :, d:] = jnp.zeros((blk, lbscr.shape[2] - d),
                                    jnp.float32)
        lbscr[1, :, d:] = jnp.zeros((blk, lbscr.shape[2] - d),
                                    jnp.float32)

    x = rows_ref[:, :]
    if masked:
        x = x * okf_ref[:, :]
    ri = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1)
    tril = (ri > ci).astype(jnp.float32)
    carry = jnp.zeros((1, d), jnp.float32)
    outs = []
    for j in range(blk // SUB):
        xc = x[j * SUB:(j + 1) * SUB, :]
        pc = _dot_e(tril, xc, (((1,), (0,)), ((), ())),
                    split_rhs=True) + carry
        outs.append(pc)
        carry = pc[SUB - 1:SUB, :] + xc[SUB - 1:SUB, :]
    el = jnp.concatenate(outs, axis=0)          # (blk, d) EXCLUSIVE
    tot_ref[0:1, :] = carry
    tot_ref[1:, :] = jnp.zeros((tot_ref.shape[0] - 1, d), jnp.float32)

    # inclusive boundary rank within the block. ind arrives ROW-form,
    # 8-sublane padded ((8, blk) block, row 0 real): a (blk, 1) column
    # would need either a lax.transpose (a Mosaic sublane->lane shuffle
    # loop) or an MXU identity contraction per block — both measured
    # ~2 us/block, eating the fusion's win
    ind_row = ind_ref[0:1, :]                    # (1, blk) 0/1 f32
    tri = _tri()
    parts = []
    rcarry = jnp.zeros((1, 1), jnp.float32)
    for j in range(blk // SUB):
        cs = jax.lax.dot_general(
            ind_row[:, j * SUB:(j + 1) * SUB], tri,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32) + rcarry
        parts.append(cs)
        rcarry = cs[:, SUB - 1:SUB]
    rank_row = jnp.concatenate(parts, axis=1).astype(jnp.int32)
    # oh[j, i] = 1 iff local row i is the (j+1)-th boundary. Built and
    # consumed in (SUB, blk) SLABS: one (blk, blk) f32 one-hot is 256
    # vregs of live intermediates — far past the register file, so
    # Mosaic spills every compare/select round trip
    dims = (((1,), (0,)), ((), ()))
    dd = partial(jax.lax.dot_general, dimension_numbers=dims,
                 precision=jax.lax.Precision.DEFAULT,
                 preferred_element_type=jnp.float32)
    if MXU_PRECISION == jax.lax.Precision.DEFAULT:
        esplit = [el]
    else:
        esplit = list(_split3(el))   # split the rhs ONCE for all slabs
    lb_parts = []
    for jo in range(blk // SUB):
        jr = jax.lax.broadcasted_iota(jnp.int32, (SUB, blk), 0) \
            + (jo * SUB + 1)
        oh_c = jnp.where(jr == rank_row, ind_row, 0.0)   # (SUB, blk)
        acc = dd(oh_c, esplit[0])
        for ej in esplit[1:]:
            acc = acc + dd(oh_c, ej)
        lb_parts.append(acc)
    lb_tile = jnp.concatenate(lb_parts, axis=0)  # (blk, d) compacted

    # PARITY-SPLIT destinations: even blocks write lba_ref, odd blocks
    # lbb_ref (two SEPARATE outputs — a leading (2, rows, 128) axis
    # lured XLA into a dim0-minor layout whose relayout copy cost
    # ~100 ms in the full graph; a lane-half split of one (rows, 256)
    # buffer fails Mosaic's 8-divisible sublane-start proof).
    # Consecutive blocks' tiles overlap (the zero-padded tails), but
    # consecutive blocks hit DIFFERENT buffers, and same-buffer
    # writers (b, b+2) are ordered by the standard wait(b-2) scratch
    # guard — no DMA write race and no per-block completion wait
    # (serializing consecutive DMAs cost ~4 us/block of end-to-end DMA
    # latency). The caller selects per row by p//blk parity.
    def dma_a(q):
        return pltpu.make_async_copy(
            lbscr.at[0], lba_ref.at[pl.ds(glo_ref[q], blk)],
            sem.at[0])

    def dma_b(q):
        return pltpu.make_async_copy(
            lbscr.at[1], lbb_ref.at[pl.ds(glo_ref[q], blk)],
            sem.at[1])

    @pl.when((b >= 2) & (slot == 0))
    def _():
        dma_a(b - 2).wait()

    @pl.when((b >= 2) & (slot == 1))
    def _():
        dma_b(b - 2).wait()

    lbscr[slot, :, :d] = lb_tile

    @pl.when(slot == 0)
    def _():
        dma_a(b).start()

    @pl.when(slot == 1)
    def _():
        dma_b(b).start()

    @pl.when(b == nb - 1)
    def _():
        @pl.when(slot == 0)
        def _():
            dma_a(b).wait()

        @pl.when(slot == 1)
        def _():
            dma_b(b).wait()

        if nb >= 2:
            @pl.when(slot == 0)
            def _():
                dma_b(b - 1).wait()

            @pl.when(slot == 1)
            def _():
                dma_a(b - 1).wait()


def _dense_boundary_reduce(rows, p, ind, d, okf=None):
    """Fast-path segment reduce for DENSE, strictly-increasing bounds
    (the chain reduce's counts' = max(counts, 1) streams): same math
    and error class as _blocked_segment_reduce (block-local prefixes +
    whole-block tots), with the inner-prefix materialization and the
    sorted boundary gather fused away (see _prefix_boundary_kernel).
    Caller guarantees rows.shape[0] % blk == 0 and that bounds are
    strictly increasing below m (duplicates only at the clamp m)."""
    m, n_bounds = rows.shape[0], p.shape[0]
    n_gauss = n_bounds - 1
    blk = CUMSUM_BLOCK if m % CUMSUM_BLOCK == 0 else 256
    nb = m // blk
    masked = okf is not None
    g0 = jnp.searchsorted(
        p, jnp.arange(nb, dtype=p.dtype) * blk,
        side="left").astype(jnp.int32)
    # ind -> row-form (nb*8, blk), row 8b real, rows 8b+1..8b+7 zero
    # pad (Mosaic's 8-sublane block tiling; one 8x pad copy in XLA is
    # ~0.2 ms at 2M rows vs ~2 us/block of in-kernel relayout)
    ind8 = jnp.pad(ind.reshape(nb, 1, blk),
                   ((0, 0), (0, 7), (0, 0))).reshape(nb * 8, blk)
    operands = [rows, ind8] + ([okf] if masked else [])
    in_specs = [
        pl.BlockSpec((blk, d), lambda i, g: (i, 0)),
        pl.BlockSpec((8, blk), lambda i, g: (i, 0)),
    ]
    if masked:
        in_specs.append(pl.BlockSpec((blk, 1), lambda i, g: (i, 0)))
    kern = partial(_prefix_boundary_kernel, nb=nb, blk=blk, d=d,
                   masked=masked)
    if not masked:
        def kern(glo_ref, rows_ref, ind_ref, lb_ref, tot_ref, lbscr,
                 sem):
            return _prefix_boundary_kernel(
                glo_ref, rows_ref, ind_ref, None, lb_ref, tot_ref,
                lbscr, sem, nb=nb, blk=blk, d=d, masked=False)
    lb_rows = n_bounds + blk
    lb_sd = jax.ShapeDtypeStruct((lb_rows, 128), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, d), lambda i, g: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, blk, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # NOTE no has_side_effects: the lb outputs are consumed below, so
    # the call is live; marking it side-effecting pinned every loop
    # iteration's ~1 GB of outputs as non-reusable (measured: 14.2 GB
    # of temps vs 3.7, and a 2x step-time regression from the
    # resulting memory pressure)
    lba, lbb, tot = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[lb_sd, lb_sd,
                   jax.ShapeDtypeStruct((nb * 8, d), jnp.float32)],
        interpret=_interpret(),
    )(g0, *operands)
    tot = tot[::8]
    # select each boundary's value from its block's parity buffer
    parity = ((p // blk) % 2)[:, None]
    lb = jnp.where(parity == 0, lba[:n_bounds, :d],
                   lbb[:n_bounds, :d])
    # tail boundaries (p == m) read the zero block: block-local prefix
    # 0 by the identity (whole-block tots cover the content)
    g_m = jnp.searchsorted(p, jnp.int32(m), side="left")
    lb = jnp.where(jnp.arange(n_bounds)[:, None] >= g_m, 0.0, lb)
    q = p // blk
    gb = jnp.searchsorted(
        q, jnp.arange(nb, dtype=q.dtype), side="right"
    ).astype(jnp.int32) - 1
    blocksum = jax.ops.segment_sum(
        tot, jnp.clip(gb, 0, n_gauss),
        num_segments=n_gauss + 1)[:n_gauss]
    return lb[1:] - lb[:-1] + blocksum


def _reduce_instance_grads_cumsum(g, perm, n_gauss, s_dim):
    """Prefix-sum alternative for LARGE instance counts: gather the
    row-major instance grads into expansion-stream order (as the
    'sorted' reduce does), then replace the segmented reduce with a
    two-level EXCLUSIVE prefix sum — per-block strictly-lower-triangular
    matmuls on the MXU plus a tiny cross-block offset cumsum — and read
    each Gaussian's sum as the difference of the prefix at its two
    expansion boundaries (consecutive Gaussians share a boundary, so it
    is ONE sorted (n+1)-row gather).

    Why: XLA segment-sum scatter-adds are row-latency-bound (~20-100
    ns/row) and degrade superlinearly with size; the prefix-sum chain is
    bandwidth/MXU-bound. Measured on-chip (examples/micro_reduce.py) at
    2M instances / 1M Gaussians: scatter 204 ms, sorted segment-sum
    155 ms, this chain 28.5 ms (+14 ms for the expansion-order row
    gather both sorted paths pay). Below ~500k instances the fixed
    stages lose to the direct scatter — RasterConfig(reduce='auto')
    picks the side by the static budget.

    perm = (stream_pos, stream_gid, bounds): stream_pos as in the
    sorted reduce (2^30 sentinel rows are zeroed); bounds (n_gauss+1,)
    are the expansion-stream segment boundaries — cumsum of the raw
    per-Gaussian rect counts, clamped to the stream length, so culled
    instances sum zeros in place and truncated tails fall out of every
    segment. Like every reduction here it is deterministic — the
    replacement for the CUDA backward's atomicAdd
    (ref:cuda_rasterizer/backward.cu:565-621); summation ORDER differs
    from the scatter path (blocked prefix vs segment accumulation), so
    results agree to fp32 rounding, not bitwise. Round 4: runs through
    _blocked_segment_reduce (block-LOCAL prefixes + whole-block segment
    sums), whose rounding scales with block/segment magnitude — the
    round-3 global-prefix boundary differences put absolute noise
    ~ eps * global prefix on tiny per-Gaussian sums (~1e-3 abs on O(10)
    grads at 250k instances; see _blocked_segment_reduce)."""
    stream_pos, _, bounds = perm
    n_rows = g.shape[0]                       # n_binned + K
    m = stream_pos.shape[0]
    ok = stream_pos < (n_rows - K)
    idx = jnp.where(ok, stream_pos, 0)
    rows = g.at[idx].get(mode="promise_in_bounds")      # (m, DOUT)
    acc = _blocked_segment_reduce(
        rows, bounds, DOUT,
        okf=ok.astype(jnp.float32)[:, None])            # (n_gauss, DOUT)
    return (acc[:, 0:2], acc[:, 2:5], acc[:, 5], acc[:, 6:9],
            acc[:, 9:9 + s_dim], acc[:, 9 + s_dim])


def pack_features(sp: Splats, binning: Binning) -> jax.Array:
    return _pack_impl(sp.mean2d, sp.conic, sp.opacity, sp.color,
                      sp.semantics, sp.depth, binning.point_list)


HALF = (TILE - 1) / 2.0  # tile-CENTER basis origin: |x| <= 7.5 halves
#                          the quadratic terms' magnitude vs a corner
#                          origin, quartering the expansion's rounding


def _p6():
    """(PIX, 6) tile-local pixel moment basis [1, x, y, x^2, xy, y^2],
    centered on the tile (constant; hoisted out of the chunk loop by
    the compiler). All power/moment formulas are affine-invariant, so
    any shared origin works — the center minimizes |x| for
    conditioning."""
    p_ids = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    x = (p_ids % TILE).astype(jnp.float32) - HALF
    y = (p_ids // TILE).astype(jnp.float32) - HALF
    one = jnp.ones((PIX, 1), jnp.float32)
    return jnp.concatenate([one, x, y, x * x, x * y, y * y], axis=1)


def _tri():
    """(SUB, SUB) upper-triangular ones: X @ tri = inclusive cumsum
    over lanes, on the MXU."""
    r = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1)
    return (r <= c).astype(jnp.float32)


def _lane_cumsum(x):
    """Inclusive cumsum along the K lanes of (PIX, K), as K/SUB
    (PIX, SUB) @ (SUB, SUB) tri matmuls with a carried total — keeps
    the MXU work LINEAR in K (one full (K, K) tri would be quadratic).
    HIGHEST precision: the tri is 0/1 (bf16-exact); the multi-pass
    decomposition keeps full-fp32 operands (see _chunk_common)."""
    tri = _tri()
    parts = []
    carry = jnp.zeros((x.shape[0], 1), jnp.float32)
    for j in range(K // SUB):
        cs = _dot_e(x[:, j * SUB:(j + 1) * SUB], tri,
                    (((1,), (0,)), ((), ()))) + carry
        parts.append(cs)
        carry = cs[:, SUB - 1:SUB]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts,
                                                            axis=1)


def _chunk_common(f, p6, tx0, ty0, off, start, end, t_carry):
    """Shared forward recompute for a chunk: returns everything the
    fwd/bwd passes need. f: (D, K) chunk.

    The per-pair Gaussian exponent runs on the MXU: power(pixel, inst)
    is a quadratic in the TILE-LOCAL pixel coordinate, so all pairs
    collapse into ONE (PIX, 6) @ (6, K) moment-basis matmul (the same
    p6 basis the backward uses for its gradient moments) — replacing
    ~10 (PIX, K) VPU passes per chunk with per-instance (1, K) algebra.
    Tile-local coordinates keep the basis terms <= 225 so the expansion
    is well-conditioned (global coords would lose ~3 digits); opacity
    is folded into the exponent's constant term (raw = opa * exp(power)
    = exp(power + log opa)), saving one more (PIX, K) pass. The CUDA
    guard power > 0 -> skip (ref:forward.cu:344-345) exists only for
    degenerate conics (PSD conics give power <= 0 identically); the
    expanded form adds ~1e-5 absolute noise near power == 0 (Gaussian
    centers), so the test carries +1e-4 slack — it still rejects
    meaningfully-positive powers while never dropping a center pixel
    the exact form would blend.

    Lanes outside [start, end) are masked invalid: the chunked binning
    layout walks K-aligned windows from (start//K)*K, so a tile's first
    chunk can carry a neighbor tile's trailing instances. (The aligned
    layout has start % K == 0, making the start test a no-op there.)

    t_carry is the ALL-VALID transmittance (product of q over every
    valid instance so far, blended or not): it is monotone
    non-increasing, so the T<1e-4 stop it drives is sticky across
    chunks exactly like the CUDA done flag
    (ref:cuda_rasterizer/forward.cu:349-357). Until the stop point it
    equals the blended-only T, so the weights are exact. The caller
    separately maintains the blended-only T (for the background
    composite) via the returned `blend_factor`."""
    ca, cb, cc = f[2:3, :], f[3:4, :], f[4:5, :]
    opa = f[5:6, :]
    x_l = f[0:1, :] - tx0                     # (1, K) tile-local center
    y_l = f[1:2, :] - ty0
    logopa = jnp.log(jnp.maximum(opa, 1e-30))
    coef = jnp.concatenate([
        -0.5 * (ca * x_l * x_l + cc * y_l * y_l) - cb * x_l * y_l
        + logopa,                             # 1
        ca * x_l + cb * y_l,                  # px
        cc * y_l + cb * x_l,                  # py
        -0.5 * ca,                            # px^2
        -cb,                                  # px*py
        -0.5 * cc,                            # py^2
    ], axis=0)                                # (6, K)
    power2 = _dot_e(                          # power + log(opa)
        p6, coef, (((1,), (0,)), ((), ())),
        split_rhs=True)                       # (PIX, K)
    raw = jnp.exp(power2)                     # == opa * exp(power)
    alpha = jnp.minimum(ALPHA_CLAMP, raw)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1) + off
    valid = (col >= start) & (col < end) \
        & (power2 <= logopa + 1e-4) & (alpha >= ALPHA_MIN)
    q = jnp.where(valid, 1.0 - alpha, 1.0)
    # inclusive cumulative product along lanes in LOG space: one
    # log + one (PIX, K) @ (K, K) upper-triangular matmul (MXU) + one
    # exp, instead of a 7-step Hillis-Steele roll+mask+multiply scan —
    # measured 12.4 -> 13.2 Mrays/s on the full train step (the scan
    # was ~45% of the kernels' VPU work). q is in [0.01, 1] (alpha
    # clamps at 0.99), so log is well-conditioned; invalid lanes carry
    # q = 1 -> log 0 exactly. The log/exp round-trip perturbs the
    # cumprod by ~1 ulp relative, which can flip the T<1e-4 cutoff on
    # measure-zero configurations — the same documented deviation
    # class as fp32 association (PARITY.md deviation 3); all oracle
    # parity tests hold at their 2e-5 tolerances.
    # Precision.HIGHEST: at DEFAULT the MXU truncates log q (range
    # [-4.6, 0]) to bf16 per pass — up to ~0.4% relative error on the
    # transmittance, measured ~5e-3 rel on rendered pixels at 1M scale
    # vs the fp32 XLA path. The tri matrix is 0/1 (bf16-exact), so the
    # multi-pass decomposition restores true fp32 cumsums; the kernels
    # are DMA/VPU-bound, so the extra MXU passes are ~free.
    if CUMPROD_SCAN:
        # Hillis-Steele product scan: log2(K) roll+select+multiply
        # rounds, no transcendentals (measured against the log-space
        # MXU route below on chip; see BASELINE.md round-5 notes)
        cp = q
        lane = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
        s = 1
        while s < K:
            cp = cp * jnp.where(lane >= s, jnp.roll(cp, s, axis=1),
                                1.0)
            s *= 2
    else:
        cp = jnp.exp(_lane_cumsum(jnp.log(q)))
    p_incl = t_carry * cp
    # exclusive prefix by division (q >= 0.01 since alpha <= 0.99):
    # one VPU pass instead of roll + lane-0 select
    p_excl = p_incl / q
    active = valid & (p_incl >= T_EPS)
    w = jnp.where(active, alpha * p_excl, 0.0)
    # full-chunk q product == cp at the last lane == min of the
    # (non-increasing) cumprod; Mosaic has no reduce_prod
    t_next = t_carry * jnp.min(cp, axis=1, keepdims=True)
    # prod over ACTIVE q only: the blended-only T update factor
    blend_factor = jnp.min(jnp.where(active, cp, 1.0), axis=1,
                           keepdims=True)
    return dict(x_l=x_l, y_l=y_l, ca=ca, cb=cb, cc=cc, opa=opa,
                raw=raw, alpha=alpha, active=active,
                q=q, p_incl=p_incl, p_excl=p_excl, w=w, t_next=t_next,
                blend_factor=blend_factor)


def _fwd_kernel(start_ref, end_ref, feat_ref, out_ref,
                scratch, sem, *, grid_x, n_out):
    t = pl.program_id(0)
    start = start_ref[t]
    end = end_ref[t]
    # floor-walk: K-aligned window containing start (chunked layout
    # has unaligned starts; aligned layout's start is a K multiple so
    # walk == start there)
    walk = (start // K) * K
    n_chunks = pl.cdiv(end - walk, K)
    p6 = _p6()
    tx0 = ((t % grid_x) * TILE).astype(jnp.float32) + HALF
    ty0 = ((t // grid_x) * TILE).astype(jnp.float32) + HALF

    # double-buffered chunk reads: prefetch chunk k+1 while computing
    # chunk k so the HBM DMA latency hides behind the VPU/MXU math
    def in_dma(k, slot):
        off = pl.multiple_of(walk + k * K, K)
        return pltpu.make_async_copy(
            feat_ref.at[:, pl.ds(off, K)], scratch.at[slot],
            sem.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        in_dma(0, 0).start()

    def cond(c):
        k, t_all, t_blend, acc = c
        # t_all is monotone non-increasing, so this early exit actually
        # fires once every pixel has stopped
        return (k < n_chunks) & (jnp.max(t_all) >= T_EPS)

    def body(c):
        k, t_all, t_blend, acc = c
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < n_chunks)
        def _():
            in_dma(k + 1, 1 - slot).start()

        in_dma(k, slot).wait()
        f = scratch[slot]
        off = pl.multiple_of(walk + k * K, K)
        ck = _chunk_common(f, p6, tx0, ty0, off, start, end, t_all)
        fout = f[6:6 + n_out, :]              # (n_out, K)
        # HIGHEST: fp32 accumulation of color/sem/depth (both operands
        # general fp32; DEFAULT would truncate to bf16 — see _chunk_common)
        acc = acc + jax.lax.dot_general(
            ck["w"], fout, (((1,), (1,)), ((), ())),
            precision=MXU_PRECISION,
            preferred_element_type=jnp.float32)
        return k + 1, ck["t_next"], t_blend * ck["blend_factor"], acc

    init = (jnp.int32(0), jnp.ones((PIX, 1), jnp.float32),
            jnp.ones((PIX, 1), jnp.float32),
            jnp.zeros((PIX, n_out), jnp.float32))
    k_done, _, t_blend, acc = jax.lax.while_loop(cond, body, init)

    # early exit leaves exactly one prefetched chunk in flight — drain
    # it so the DMA semaphore balances
    @pl.when(k_done < n_chunks)
    def _():
        in_dma(k_done, jax.lax.rem(k_done, 2)).wait()

    out_ref[0, :, :n_out] = acc
    out_ref[0, :, n_out:n_out + 1] = t_blend
    out_ref[0, :, n_out + 1:] = jnp.zeros(
        (PIX, out_ref.shape[-1] - n_out - 1), jnp.float32)


def _bwd_kernel(start_ref, end_ref, cbase_ref, feat_ref, out_res_ref,
                g_ref, zeros_ref, dfeat_ref, scratch, dscratch,
                tscratch, sem_in, sem_out, *, grid_x, n_out,
                with_gid):
    """zeros_ref is aliased to dfeat_ref (input_output_aliases): XLA
    materializes the all-zero instance-grad buffer at full HBM
    bandwidth BEFORE the kernel, so slots past each tile\'s early-exit
    point need no chunked zero-fill DMAs here (a tile segment can hold
    thousands of post-termination slots; writing them 64 KB at a time
    from the kernel was latency-bound).

    Output rows are indexed by (tile, chunk): row slice for chunk k is
    (cbase[t] + k) * K. The aligned layout passes cbase = start // K,
    which reproduces its stream-offset writes exactly; the chunked
    layout passes disjoint per-tile chunk prefixes (boundary stream
    chunks are shared between tiles there, so stream-offset writes
    would race). with_gid: the feature matrix carries each instance's
    Gaussian id as row 6+n_out; it is copied into the output rows so
    the reduction needs no index gather."""
    del zeros_ref
    d_rows = dscratch.shape[0]            # the d real feature rows
    t = pl.program_id(0)
    start = start_ref[t]
    end = end_ref[t]
    walk = (start // K) * K
    cbase = cbase_ref[t]
    p6 = _p6()
    tx0 = ((t % grid_x) * TILE).astype(jnp.float32) + HALF
    ty0 = ((t // grid_x) * TILE).astype(jnp.float32) + HALF

    o = out_res_ref[0]                         # (PIX, OUTC)
    g = g_ref[0]
    gc = g[:, :n_out]                          # (PIX, n_out)
    g_t = g[:, n_out:n_out + 1]                # (PIX, 1)
    t_fin = o[:, n_out:n_out + 1]
    total = jnp.sum(gc * o[:, :n_out], axis=1, keepdims=True) \
        + g_t * t_fin                          # (PIX, 1)

    n_chunks = pl.cdiv(end - walk, K)

    def in_dma(k, slot):
        off = pl.multiple_of(walk + k * K, K)
        return pltpu.make_async_copy(
            feat_ref.at[:, pl.ds(off, K)], scratch.at[slot],
            sem_in.at[slot])

    def out_dma(k, slot):
        if with_gid:
            # chunked: FEATURE-major narrow output (d_pad, chunks*K) —
            # K=128-lane slices are tile-aligned on both sides (Mosaic
            # rejects partial-lane (<128 wide) VMEM/HBM slices, which
            # rules out narrow row-major tiles); also saves the
            # in-kernel (d, K) -> (K, d) flip
            off = pl.multiple_of((cbase + k) * K, K)
            return pltpu.make_async_copy(
                tscratch.at[slot], dfeat_ref.at[:, pl.ds(off, K)],
                sem_out.at[slot])
        off = pl.multiple_of((cbase + k) * K, K)
        return pltpu.make_async_copy(
            tscratch.at[slot], dfeat_ref.at[pl.ds(off, K)],
            sem_out.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        in_dma(0, 0).start()

    # the padding lanes of both row-major output tiles are constant
    # zero — write them once, outside the chunk loop
    if not with_gid:   # aligned row-major tiles: constant zero lanes
        tscratch[0, :, d_rows:] = jnp.zeros(
            (K, tscratch.shape[2] - d_rows), jnp.float32)
        tscratch[1, :, d_rows:] = jnp.zeros(
            (K, tscratch.shape[2] - d_rows), jnp.float32)
    # d_pad alignment rows (between 6+n_out and d_rows) likewise
    dscratch[6 + n_out:, :] = jnp.zeros(
        (d_rows - 6 - n_out, K), jnp.float32)

    def body(c):
        k, t_all, prefix = c
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < n_chunks)
        def _():
            in_dma(k + 1, 1 - slot).start()

        in_dma(k, slot).wait()
        f = scratch[slot]
        off = pl.multiple_of(walk + k * K, K)
        ck = _chunk_common(f, p6, tx0, ty0, off, start, end, t_all)
        w, q, active = ck["w"], ck["q"], ck["active"]
        fout = f[6:6 + n_out, :]

        # f_i . g per (pixel, instance).  All backward matmuls run at
        # Precision.HIGHEST: DEFAULT truncates fp32 operands to bf16 on
        # the MXU (~0.4% relative grad error; the CUDA reference is
        # fully fp32). The kernels are DMA/VPU-bound so this is ~free.
        hi = MXU_PRECISION
        fdotg = jax.lax.dot_general(
            gc, fout, (((1,), (0,)), ((), ())), precision=hi,
            preferred_element_type=jnp.float32)          # (PIX, K)
        # color/sem/depth grads: (n_out, K)
        dfo = jax.lax.dot_general(
            gc, w, (((0,), (0,)), ((), ())), precision=hi,
            preferred_element_type=jnp.float32)
        wf = w * fdotg
        prefix_incl = prefix + _lane_cumsum(wf)
        r_suffix = total - prefix_incl
        t_prev = ck["p_excl"]
        dalpha = jnp.where(active, t_prev * fdotg - r_suffix / q, 0.0)
        # dpow = d power = raw * dalpha where unclamped (raw is the
        # opacity-folded exp, == opa * g_exp)
        dpow = jnp.where(ck["raw"] < ALPHA_CLAMP,
                         ck["raw"] * dalpha, 0.0)

        # ---- geometric grads via pixel MOMENTS (one MXU matmul) ----
        # Each of the five mean2d/conic grad sums is a polynomial in
        # the pixel coordinate weighted by dpow, so all five collapse
        # into the 0th..2nd moments of dpow over the tile's pixels:
        #   mom = P6^T @ dpow,  P6 = [1, px, py, px^2, px*py, py^2]
        # (TILE-LOCAL coordinates keep px^2 <= 225, so the expansion
        # terms below stay well-conditioned.) This replaces ~15
        # (PIX, K) VPU ops + 5 sublane reductions per chunk with one
        # (6, PIX) @ (PIX, K) MXU op + (1, K) algebra. The forward
        # quantities (power, alpha, masks) are untouched, so every
        # threshold decision still matches the CUDA kernel bit-for-bit;
        # only the gradient accumulation order changes (same sums,
        # different rounding — the reference's atomicAdd order is
        # nondeterministic anyway). ref:cuda_rasterizer/backward.cu:
        # 598-621.
        mom = _dot_e(
            p6, dpow, (((0,), (0,)), ((), ())),
            split_rhs=True)                              # (6, K)
        m0, m1, m2 = mom[0:1, :], mom[1:2, :], mom[2:3, :]
        m3, m4, m5 = mom[3:4, :], mom[4:5, :], mom[5:6, :]
        x_l, y_l = ck["x_l"], ck["y_l"]                  # (1, K)
        ca, cb, cc, opa = ck["ca"], ck["cb"], ck["cc"], ck["opa"]

        dscratch[0:1, :] = -(ca * x_l + cb * y_l) * m0 + ca * m1 \
            + cb * m2
        dscratch[1:2, :] = -(cc * y_l + cb * x_l) * m0 + cc * m2 \
            + cb * m1
        dscratch[2:3, :] = -0.5 * (x_l * x_l * m0 - 2.0 * x_l * m1
                                   + m3)
        dscratch[3:4, :] = -(x_l * y_l * m0 - x_l * m2 - y_l * m1
                             + m4)
        dscratch[4:5, :] = -0.5 * (y_l * y_l * m0 - 2.0 * y_l * m2
                                   + m5)
        # dpow = opa * (g_exp * dalpha * unclamped), so the opacity
        # grad is m0 / opa (sentinel columns have opa == 0 -> 0)
        dscratch[5:6, :] = jnp.where(opa > 0.0, m0 / opa, 0.0)
        dscratch[6:6 + n_out, :] = dfo
        if with_gid:
            # transport the instance's Gaussian id (feat row 6+n_out)
            # into the output row so the reduction has its keys without
            # an instance-scale index gather
            dscratch[6 + n_out:7 + n_out, :] = \
                f[6 + n_out:7 + n_out, :]

        # double-buffered writes: make sure the DMA that last read this
        # tscratch slot (chunk k-2) is done before overwriting it
        @pl.when(k >= 2)
        def _():
            out_dma(k - 2, slot).wait()

        if with_gid:
            # chunked: feature-major copy, no flip (the caller pays one
            # narrow (d+1, R) -> (R, d+1) transpose before the reduce)
            tscratch[slot] = dscratch[:, :]
        else:
            # aligned: flip the d real rows to row-major (K, d) on this
            # VMEM tile so the scatter reduction never pays a
            # (D, M) -> (M, D) transpose at instance scale
            tscratch[slot, :, :d_rows] = dscratch[:, :].T
        out_dma(k, slot).start()

        prefix = prefix + jnp.sum(wf, axis=1, keepdims=True)
        return k + 1, ck["t_next"], prefix

    # gradient walk with the forward\'s early termination (all grads
    # past the cutoff are zero — the CUDA backward skips them via
    # last_contributor, ref:backward.cu:527-529); those slots keep the
    # pre-zeroed buffer contents (see docstring)
    def cond(c):
        k, t_all, _ = c
        return (k < n_chunks) & (jnp.max(t_all) >= T_EPS)

    init = (jnp.int32(0), jnp.ones((PIX, 1), jnp.float32),
            jnp.zeros((PIX, 1), jnp.float32))
    k_done, _, _ = jax.lax.while_loop(cond, body, init)

    # drain: one prefetched read (early exit) and up to two writes
    @pl.when(k_done < n_chunks)
    def _():
        in_dma(k_done, jax.lax.rem(k_done, 2)).wait()

    @pl.when(k_done >= 2)
    def _():
        out_dma(k_done - 2, jax.lax.rem(k_done, 2)).wait()

    @pl.when(k_done >= 1)
    def _():
        out_dma(k_done - 1, jax.lax.rem(k_done - 1, 2)).wait()


def _trace_kernel(start_ref, end_ref, cbase_ref, feat_ref, semt_ref,
                  zeros_ref, out_ref, rows_ref, scratch, tscratch,
                  sem_in, sem_out, *, grid_x, n_out, sa, with_gid):
    """Fused forward blend + 2D->3D feature lifting (traceCUDA,
    ref:cuda_rasterizer/forward.cu:422-583): ONE chunk walk produces
    both the blended tile image and, per instance, the sum over the
    tile's pixels it blends with alpha > 0.005 of the pixel's
    feature-augmented vector (semt: (PIX, sa), image features plus a
    trailing ones channel zeroed outside the image, so lane sa-1 is the
    hit counter — the CUDA kernel's atomicAdd num_gsem,
    ref:forward.cu:521-526, as one more matmul column). Per-instance
    rows go to disjoint K-aligned slices exactly like _bwd_kernel;
    zeros_ref is aliased to rows_ref (see _bwd_kernel docstring)."""
    del zeros_ref
    t = pl.program_id(0)
    start = start_ref[t]
    end = end_ref[t]
    walk = (start // K) * K
    cbase = cbase_ref[t]
    n_chunks = pl.cdiv(end - walk, K)
    p6 = _p6()
    tx0 = ((t % grid_x) * TILE).astype(jnp.float32) + HALF
    ty0 = ((t // grid_x) * TILE).astype(jnp.float32) + HALF
    semt = semt_ref[0]                                # (PIX, sa)

    def in_dma(k, slot):
        off = pl.multiple_of(walk + k * K, K)
        return pltpu.make_async_copy(
            feat_ref.at[:, pl.ds(off, K)], scratch.at[slot],
            sem_in.at[slot])

    def out_dma(k, slot):
        if with_gid:
            # chunked: feature-major narrow output (see _bwd_kernel)
            off = pl.multiple_of((cbase + k) * K, K)
            return pltpu.make_async_copy(
                tscratch.at[slot], rows_ref.at[:, pl.ds(off, K)],
                sem_out.at[slot])
        off = pl.multiple_of((cbase + k) * K, K)
        return pltpu.make_async_copy(
            tscratch.at[slot], rows_ref.at[pl.ds(off, K)],
            sem_out.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        in_dma(0, 0).start()

    # constant-zero padding of the row tiles, written once
    if with_gid:   # feature-major (rows, K): pad beyond the key row
        tscratch[0, sa + 1:, :] = jnp.zeros(
            (tscratch.shape[1] - sa - 1, K), jnp.float32)
        tscratch[1, sa + 1:, :] = jnp.zeros(
            (tscratch.shape[1] - sa - 1, K), jnp.float32)
    else:          # aligned row-major (K, DOUT): pad lanes
        tscratch[0, :, sa:] = jnp.zeros((K, tscratch.shape[2] - sa),
                                        jnp.float32)
        tscratch[1, :, sa:] = jnp.zeros((K, tscratch.shape[2] - sa),
                                        jnp.float32)

    def cond(c):
        k, t_all, t_blend, acc = c
        return (k < n_chunks) & (jnp.max(t_all) >= T_EPS)

    def body(c):
        k, t_all, t_blend, acc = c
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < n_chunks)
        def _():
            in_dma(k + 1, 1 - slot).start()

        in_dma(k, slot).wait()
        f = scratch[slot]
        off = pl.multiple_of(walk + k * K, K)
        ck = _chunk_common(f, p6, tx0, ty0, off, start, end, t_all)
        fout = f[6:6 + n_out, :]
        # HIGHEST on both trace matmuls: fp32 accumulation (hit is 0/1
        # bf16-exact, but semt/w/fout are general fp32 — DEFAULT would
        # truncate them per MXU pass; see _chunk_common)
        acc = acc + jax.lax.dot_general(
            ck["w"], fout, (((1,), (1,)), ((), ())),
            precision=MXU_PRECISION,
            preferred_element_type=jnp.float32)
        # blended AND alpha > 0.005 (strict, ref:forward.cu:512)
        hit = (ck["active"] & (ck["alpha"] > 0.005)) \
            .astype(jnp.float32)                      # (PIX, K)

        @pl.when(k >= 2)
        def _():
            out_dma(k - 2, slot).wait()

        if with_gid:
            # feature-major (sa, K) lift + the transported Gaussian-id
            # key (feat row 6+n_out) as one more row — no index gather
            # in the reduction, no in-kernel transpose
            # hit is 0/1 (bf16-exact): 3-pass one-sided split
            tscratch[slot, :sa, :] = _dot_e(
                semt, hit, (((0,), (0,)), ((), ())))  # (sa, K)
            tscratch[slot, sa:sa + 1, :] = f[6 + n_out:7 + n_out, :]
        else:
            # hit is 0/1 (bf16-exact): 3-pass one-sided split
            tscratch[slot, :, :sa] = _dot_e(
                hit, semt, (((0,), (0,)), ((), ())),
                split_rhs=True)                       # (K, sa)
        out_dma(k, slot).start()
        return k + 1, ck["t_next"], t_blend * ck["blend_factor"], acc

    init = (jnp.int32(0), jnp.ones((PIX, 1), jnp.float32),
            jnp.ones((PIX, 1), jnp.float32),
            jnp.zeros((PIX, n_out), jnp.float32))
    k_done, _, t_blend, acc = jax.lax.while_loop(cond, body, init)

    # drain in-flight DMAs (same pattern as _bwd_kernel)
    @pl.when(k_done < n_chunks)
    def _():
        in_dma(k_done, jax.lax.rem(k_done, 2)).wait()

    @pl.when(k_done >= 2)
    def _():
        out_dma(k_done - 2, jax.lax.rem(k_done, 2)).wait()

    @pl.when(k_done >= 1)
    def _():
        out_dma(k_done - 1, jax.lax.rem(k_done - 1, 2)).wait()

    out_ref[0, :, :n_out] = acc
    out_ref[0, :, n_out:n_out + 1] = t_blend
    out_ref[0, :, n_out + 1:] = jnp.zeros(
        (PIX, out_ref.shape[-1] - n_out - 1), jnp.float32)


def trace_tiles_pallas(sp: Splats, binning: Binning,
                       sem_aug_tiles: jax.Array, bg: jax.Array,
                       *, grid_x: int, grid_y: int):
    """Fused render + trace (the XLA path runs a 64-step scan over
    every tile's padded cap — this walks exact segments once).

    sem_aug_tiles: (T, PIX, sa) per-pixel features to lift with a
    trailing ONES channel, both zeroed outside the image (tile
    padding), so the ones channel doubles as the hit counter. Counts
    accumulate in f32 — exact below 2^24 hits per Gaussian (an 8.8 Mpx
    frame cannot overflow it).

    Returns (color (T,PIX,3), sem (T,PIX,S), depth, alpha,
    lifted (N, sa) per-Gaussian sums [features | hit count]).
    Forward-only — differentiate trace via backend='xla'.
    Requires bin_splats(..., align=K)."""
    s = sp.semantics.shape[-1]
    chunked = binning.chunk_base is not None
    d = 7 + 3 + s + (1 if chunked else 0)
    if d + ((-d) % 8) > DOUT:
        raise ValueError(f"sem_dim {s} too large for pallas trace; "
                         f"use RasterConfig(backend='xla')")
    sa = sem_aug_tiles.shape[-1]
    if sa + (1 if chunked else 0) > DOUT:
        raise ValueError(f"traced feature dim {sa - 1} needs "
                         f"{sa + (1 if chunked else 0)} row lanes > "
                         f"DOUT={DOUT}; use RasterConfig(backend="
                         f"'xla')")
    n_out = 3 + s + 1
    feat = _pack_impl(sp.mean2d, sp.conic, sp.opacity, sp.color,
                      sp.semantics, sp.depth, binning.point_list,
                      with_gid=chunked)
    num_tiles = grid_x * grid_y
    outc = n_out + 2
    n_inst = feat.shape[1]
    if chunked:
        # feature-major narrow rows (see _blend_core_bwd)
        n_chunks_cap = (n_inst - K) // K + num_tiles + 1
        cbase = binning.chunk_base
        dout_tr = -(-(sa + 1) // 8) * 8
        rows_sd = jax.ShapeDtypeStruct((dout_tr, n_chunks_cap * K),
                                       jnp.float32)
        tscr = pltpu.VMEM((2, dout_tr, K), jnp.float32)
    else:
        cbase = binning.tile_start // K
        dout_tr = DOUT
        rows_sd = jax.ShapeDtypeStruct((n_inst, DOUT), jnp.float32)
        tscr = pltpu.VMEM((2, K, DOUT), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, PIX, sa), lambda t, s_, e, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, PIX, outc), lambda t, s_, e, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, feat.shape[0], K), jnp.float32),
            tscr,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # zeros input aliased to the rows output (operand index 5 counts
    # the three scalar-prefetch operands) — see _bwd_kernel docstring
    out, rows = pl.pallas_call(
        partial(_trace_kernel, grid_x=grid_x, n_out=n_out, sa=sa,
                with_gid=chunked),
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, PIX, outc), jnp.float32),
            rows_sd,
        ],
        grid_spec=grid_spec,
        interpret=_interpret(),
        input_output_aliases={5: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(binning.tile_start, binning.tile_end, cbase, feat,
      sem_aug_tiles, jnp.zeros(rows_sd.shape, jnp.float32))
    if chunked:
        rows = rows[:sa + 1].T     # one narrow transpose to row-major

    # instance rows -> per-Gaussian sums (deterministic segment-sum)
    n_gauss = sp.mean2d.shape[0]
    if chunked:
        # keys transported by the kernel in lane sa; prezeroed rows
        # (key 0, zero values) are harmless
        keys = jnp.clip(rows[:, sa].astype(jnp.int32), 0, n_gauss - 1)
        lifted = jax.ops.segment_sum(rows[:, :sa], keys,
                                     num_segments=n_gauss)
    else:
        gid = binning.point_list
        gt = rows[:-K, :sa]
        ok = gid >= 0
        lifted = jax.ops.segment_sum(
            jnp.where(ok[:, None], gt, 0.0),
            jnp.where(ok, gid, n_gauss),
            num_segments=n_gauss + 1)[:n_gauss]

    t_final = out[:, :, n_out]
    color = out[:, :, :3] + t_final[:, :, None] * bg[None, None, :]
    sem = out[:, :, 3:3 + s]
    depth = out[:, :, 3 + s]
    return color, sem, depth, 1.0 - t_final, lifted


def _reduce_transported_chain(rows, sort_slots, bounds, starts, ends,
                              cbase, n_gauss, s_dim, g_stream=None):
    """Chunked chain reduction: XLA's multi-column segment-sum scatter
    costs ~12 ms PER COLUMN at 2.5M rows (column-serial), so the
    d~21-column reduction via plain scatter is ~250 ms. This chain is
    gather/MXU-only (~100 ms measured end-to-end at 1M):

      1. invert the sort permutation lazily: sorted position p ->
         backward row index is AFFINE per tile (cbase*K - walk + p), so
         stream_pos = scatter(sort_slots -> row) is ONE 1-column
         scatter (~18 ms);
      2. gather rows into EXPANSION order (Gaussian-major, ~47 ms);
      3. block-local exclusive prefixes (tri matmuls on the MXU at
         HIGHEST, ~6 ms) + whole-block totals;
      4. per-Gaussian sums via _blocked_segment_reduce at
         bounds = cumsum(max(counts,1)) — boundary differences of
         BLOCK-LOCAL prefixes plus a per-Gaussian segment-sum of block
         totals, so rounding scales with block/segment magnitude (the
         round-3 global-prefix version failed its own 5e-4 parity bar).

    Deterministic; summation order is blocked-prefix (PARITY.md
    deviation 3's error class), same as the aligned cumsum reduce."""
    d = 7 + 3 + s_dim
    m = sort_slots.shape[0]
    n_rows = rows.shape[0]
    walk = (starts // K) * K
    pad = cbase * K - walk                              # (T,)
    kept = ends[-1]   # contiguous stream: last tile's end == total kept
    # pad per sorted position. pad is monotone non-decreasing over the
    # tiles that own rows (for consecutive nonempty tiles t -> t'',
    # start_t'' == end_t, so pad_t'' - pad_t = K*(ceil((end_t-walk_t)/K)
    # - end_t//K + start_t//K) in {0, K}; empty tiles carry the same
    # value as the next nonempty one), so a scatter-max of pad[t] at
    # each segment start + cummax fills the segments — ~3 ms vs the
    # 12.6 ms the jnp.repeat this replaces cost in-situ at 2.4M rows
    # (lowered to a per-element table gather).
    mark = jnp.zeros(m, jnp.int32).at[starts].max(pad, mode="drop")
    pad_p = jax.lax.cummax(mark)
    row_p = jnp.arange(m, dtype=jnp.int32) + pad_p
    row_p = jnp.where(jnp.arange(m, dtype=jnp.int32) < kept, row_p,
                      jnp.int32(2 ** 30))
    # invert the sort permutation by SORTING (sort_slots, row_p) on the
    # expansion slot: measured 6.3 ms vs 13.4 ms for the equivalent
    # scatter inversion at 2.38M rows (sort_slots is a full permutation
    # of arange(m), so the sorted payload IS stream_pos)
    _, stream_pos = jax.lax.sort([sort_slots, row_p], num_keys=1)
    ok = stream_pos < n_rows
    idx = jnp.where(ok, stream_pos, 0)
    # rows arrive 64-lane row-major straight from the transpose
    # (_blend_core_bwd pads sublanes BEFORE transposing) — XLA's TPU
    # row gather has a fast path at >= 64-lane rows (12.7 ns/row
    # measured at 2.4M rows, MICRO_GATHER.json) while 16-32-lane rows
    # run ~2-3x slower; the round-3 in-chain lane pad/slice relayouts
    # cost ~45 ms on top and are gone. The reduce runs at the full
    # lane width too (the tri matmuls pad to 128 MXU lanes either
    # way); per-column slicing happens once at n_gauss scale.
    r = rows.at[idx].get(mode="promise_in_bounds")
    p = jnp.minimum(bounds, m)
    okf = ok.astype(jnp.float32)[:, None]
    # invalid rows masked INSIDE the prefix kernel (a separate XLA
    # select materialized 600 MB here)
    # _dense_boundary_reduce (round 5) fuses the boundary extraction
    # into the prefix kernel — bit-identical output, and in isolation
    # it matches _blocked_segment_reduce (21.1 vs 21.7 ms at the 1M
    # headline: the one-hot compaction matmuls cost what the removed
    # 1M-row sorted gather did). OPT-IN (GOI_DENSE_REDUCE=1) because
    # inside the full train step its two extra 0.5 GB lb buffers push
    # peak HBM past XLA's rematerialization threshold (14.2 GB of
    # temps vs 3.7; the remat'd recomputation halved end-to-end
    # throughput, 2.02 -> 1.09 Mrays/s). Revisit if the step's
    # residual footprint shrinks.
    import os as _os
    if g_stream is not None and m % 256 == 0 \
            and _os.environ.get("GOI_DENSE_REDUCE"):
        # round-5 fast path: the chain's bounds are cumsum(max(counts,
        # 1)) — strictly increasing below m — so boundary extraction
        # fuses into the prefix kernel (no inner-prefix HBM round trip,
        # no 1M-row boundary gather). ind from g_stream by one diff.
        ind = jnp.concatenate(
            [jnp.ones((1,), jnp.float32),
             (g_stream[1:] != g_stream[:-1]).astype(jnp.float32)])
        # the FINAL boundary (end of the last segment, = total demand)
        # is not any segment's start — mark it too (drop when it sits
        # at the clamp m, where the caller's tail mask supplies the 0)
        ind = ind.at[p[-1]].set(1.0, mode="drop")[:, None]
        acc = _dense_boundary_reduce(r, p, ind, r.shape[1], okf=okf)
    else:
        acc = _blocked_segment_reduce(r, p, r.shape[1], okf=okf)
    return (acc[:, 0:2], acc[:, 2:5], acc[:, 5], acc[:, 6:9],
            acc[:, 9:9 + s_dim], acc[:, 9 + s_dim])


def _reduce_transported(rows, n_gauss, s_dim):
    """Chunked-layout reduction: per-instance grad rows carry their own
    Gaussian id (column 6+n_out = d, transported by the bwd kernel), so
    the instance->Gaussian reduction is ONE segment-sum with zero index
    gathers. Prezeroed rows (early-exit / unowned chunk slack) carry
    key 0 and all-zero values — summing them is harmless; boundary
    lanes masked by the kernel likewise have zero grads under their
    (real) neighbor-tile key. Deterministic (XLA TPU scatters are
    atomics-free)."""
    d = 7 + 3 + s_dim
    keys = jnp.clip(rows[:, d].astype(jnp.int32), 0, n_gauss - 1)
    acc = jax.ops.segment_sum(rows[:, :d], keys,
                              num_segments=n_gauss)
    return (acc[:, 0:2], acc[:, 2:5], acc[:, 5], acc[:, 6:9],
            acc[:, 9:9 + s_dim], acc[:, 9 + s_dim])


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _blend_core(grid_x, grid_y, n_out, chunked, mean2d, conic, opacity,
                color, semantics, depth, gid, starts, ends, cbase,
                perm):
    """pack + tiled blend under ONE custom VJP. Merging them (rather
    than giving pack its own VJP) frees the backward to hand
    _reduce_instance_grads ROW-major instance grads even though the
    forward feat matrix is feature-major — a custom_vjp cotangent must
    match its primal's shape, so with a separate pack VJP the bwd
    kernel would be forced to emit feature-major grads and the
    reduction would start with a ~3 ms instance-scale transpose.

    chunked=True selects the round-3 layout: floor-walk segments,
    per-(tile,chunk) backward rows sized by cbase's chunk prefix, and
    the transported-key reduction."""
    out, _ = _blend_core_fwd(grid_x, grid_y, n_out, chunked, mean2d,
                             conic, opacity, color, semantics, depth,
                             gid, starts, ends, cbase, perm)
    return out


def _blend_core_fwd(grid_x, grid_y, n_out, chunked, mean2d, conic,
                    opacity, color, semantics, depth, gid, starts,
                    ends, cbase, perm):
    feat = _pack_impl(mean2d, conic, opacity, color, semantics, depth,
                      gid, with_gid=chunked)
    num_tiles = grid_x * grid_y
    outc = n_out + 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, PIX, outc),
                               lambda t, s, e: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, feat.shape[0], K), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        partial(_fwd_kernel, grid_x=grid_x, n_out=n_out),
        out_shape=jax.ShapeDtypeStruct((num_tiles, PIX, outc),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(starts, ends, feat)
    return out, (feat, starts, ends, cbase, out, gid, perm,
                 mean2d.shape[0], semantics.shape[-1])


def _blend_core_bwd(grid_x, grid_y, n_out, chunked, res, g):
    feat, starts, ends, cbase, out, gid, perm, n_gauss, s_dim = res
    num_tiles = grid_x * grid_y
    outc = n_out + 2
    n_inst = feat.shape[1]
    if chunked:
        # per-(tile, chunk) row slices: every tile owns ceil(span/K).
        # The buffer is FEATURE-major and NARROW ((d_pad, chunks*K):
        # the real grad rows + the transported key, 8-padded) — K-lane
        # slices are tile-aligned on both sides, the kernel skips the
        # per-chunk flip, and the downstream reduction's traffic drops
        # 5x vs DOUT=128 row-major tiles (which Mosaic also cannot
        # emit narrow: partial-lane slices are rejected).
        n_chunks_cap = (n_inst - K) // K + num_tiles + 1
        out_sd = jax.ShapeDtypeStruct(
            (feat.shape[0], n_chunks_cap * K), jnp.float32)
        tscr = pltpu.VMEM((2, feat.shape[0], K), jnp.float32)
    else:
        out_sd = jax.ShapeDtypeStruct((n_inst, DOUT), jnp.float32)
        tscr = pltpu.VMEM((2, K, DOUT), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, PIX, outc), lambda t, s, e, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIX, outc), lambda t, s, e, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, feat.shape[0], K), jnp.float32),
            pltpu.VMEM((feat.shape[0], K), jnp.float32),
            tscr,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # the zeros input is aliased to the dfeat output (index 6 counts
    # the three scalar-prefetch operands): see _bwd_kernel docstring
    dfeat = pl.pallas_call(
        partial(_bwd_kernel, grid_x=grid_x, n_out=n_out,
                with_gid=chunked),
        out_shape=out_sd,
        grid_spec=grid_spec,
        interpret=_interpret(),
        input_output_aliases={6: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, ends, cbase, feat, out, g,
      jnp.zeros(out_sd.shape, jnp.float32))
    if chunked:
        # ONE transpose to row-major for the reduction. Round 4: pad
        # the SUBLANE dim to GATHER_LANES first (a cheap sequential
        # pad of the feature-major buffer), so the transpose emits
        # 64-lane rows directly — the round-3 pipeline transposed the
        # narrow d+1 rows and then lane-padded (m, 21) -> (m, 64)
        # inside the chain, and that lane relayout at 2.4M rows cost
        # ~45 ms (CHAIN_PROFILE expansion_gather 75.6 ms vs 30.2 ms
        # for the bare 64-lane gather, MICRO_GATHER.json).
        d_keyed = 7 + 3 + s_dim + 1
        gl = GATHER_LANES if d_keyed <= GATHER_LANES else dfeat.shape[0]
        if dfeat.shape[0] < gl:
            dfeat = jnp.pad(dfeat, ((0, gl - dfeat.shape[0]), (0, 0)))
        dfeat = dfeat[:gl].T                     # (m, gl) 64-lane rows
    # rows never covered by a tile segment hold prezeroed memory; the
    # reductions mask (aligned: sentinel gids / sentinel stream_pos) or
    # harmlessly absorb (chunked: zero rows) them
    if chunked and perm:
        sort_slots, bounds = perm[0], perm[1]
        g_stream = perm[2] if len(perm) > 2 else None
        dmean2d, dconic, dopa, dcolor, dsem, ddepth = \
            _reduce_transported_chain(dfeat, sort_slots, bounds,
                                      starts, ends, cbase, n_gauss,
                                      s_dim, g_stream=g_stream)
    elif chunked:
        dmean2d, dconic, dopa, dcolor, dsem, ddepth = \
            _reduce_transported(dfeat, n_gauss, s_dim)
    elif len(perm) == 3:
        dmean2d, dconic, dopa, dcolor, dsem, ddepth = \
            _reduce_instance_grads_cumsum(dfeat, perm, n_gauss, s_dim)
    elif perm:
        dmean2d, dconic, dopa, dcolor, dsem, ddepth = \
            _reduce_instance_grads_sorted(dfeat, perm, n_gauss, s_dim)
    else:
        dmean2d, dconic, dopa, dcolor, dsem, ddepth = \
            _reduce_instance_grads(dfeat, gid, n_gauss, s_dim)
    return (dmean2d, dconic, dopa, dcolor, dsem, ddepth,
            None, None, None, None, jax.tree.map(lambda _: None, perm))


_blend_core.defvjp(_blend_core_fwd, _blend_core_bwd)


def blend_tiles_pallas(sp: Splats, binning: Binning, bg: jax.Array,
                       *, grid_x: int, grid_y: int,
                       reduce: str = "scatter"):
    """Drop-in replacement for blend_tiles (XLA path): returns
    (color (T,256,3), sem (T,256,S), depth (T,256), alpha (T,256)).

    Aligned layout (bin_splats(..., align=K)): reduce is one of
    'scatter'/'sorted'/'cumsum' ('sorted'/'cumsum' additionally need
    bin_splats(..., export_perm=True)).
    Chunked layout (bin_splats_chunked, binning.chunk_base set): the
    reduction always uses kernel-transported keys; reduce must be
    'scatter'."""
    s = sp.semantics.shape[-1]
    d = 7 + 3 + s
    chunked = binning.chunk_base is not None
    d_tot = d + (1 if chunked else 0)
    if d_tot + ((-d_tot) % 8) > DOUT:
        raise ValueError(
            f"sem_dim {s} needs {d_tot + ((-d_tot) % 8)} grad lanes > "
            f"DOUT={DOUT} (the pallas backward's row-major grad tile); "
            f"use RasterConfig(backend='xla') for larger sem_dim")
    n_out = 3 + s + 1
    if reduce not in ("scatter", "sorted", "cumsum", "chain"):
        raise ValueError(f"unknown reduce {reduce!r} (resolve 'auto' "
                         f"before calling blend_tiles_pallas)")
    if chunked and reduce not in ("scatter", "chain"):
        raise ValueError(
            f"chunked binning reduces via kernel-transported keys "
            f"('scatter') or the permutation chain ('chain'); "
            f"reduce={reduce!r} is an aligned-layout mode")
    if not chunked and reduce == "chain":
        raise ValueError("reduce='chain' needs the chunked layout")
    if chunked and reduce == "chain" and binning.sort_slots is None:
        raise ValueError("reduce='chain' needs bin_splats_chunked("
                         "..., export_perm=True)")
    # the requested reduce decides the strategy; the binning layout must
    # match it (a perm-exporting binning does NOT silently upgrade
    # reduce='scatter', and 'sorted'/'cumsum' without the exported
    # permutation is an error, not a silent scatter downgrade)
    perm = ()
    if reduce == "chain":
        # expansion-stream boundaries with the chunked layout's forced
        # sentinel slots (counts' = max(counts, 1))
        counts = jnp.maximum(jax.lax.stop_gradient(
            sp.tiles_touched).astype(jnp.int32), 1)
        bounds = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)])
        # g_stream (when the binning exports it) enables the fused
        # boundary-compaction reduce (_dense_boundary_reduce)
        perm = (binning.sort_slots, bounds, binning.g_stream) \
            if binning.g_stream is not None \
            else (binning.sort_slots, bounds)
    if reduce in ("sorted", "cumsum"):
        if binning.stream_pos is None:
            raise ValueError(
                f"reduce={reduce!r} needs the sort permutation: call "
                f"bin_splats(..., align=K, export_perm=True)")
        perm = (binning.stream_pos, binning.stream_gid)
    if reduce == "cumsum":
        # expansion-stream segment boundaries for the prefix-sum
        # reduce: cumsum of the raw per-Gaussian rect counts (matches
        # binning._expand_instances' offsets), clamped to the stream
        counts = jax.lax.stop_gradient(
            sp.tiles_touched).astype(jnp.int32)
        bounds = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)])
        perm = perm + (jnp.minimum(
            bounds, binning.stream_pos.shape[0]),)
    cbase = (binning.chunk_base if chunked
             else binning.tile_start // K)
    raw = _blend_core(grid_x, grid_y, n_out, chunked, sp.mean2d,
                      sp.conic, sp.opacity, sp.color, sp.semantics,
                      sp.depth, binning.point_list,
                      binning.tile_start, binning.tile_end, cbase,
                      perm)
    t_final = raw[:, :, n_out]
    color = raw[:, :, :3] + t_final[:, :, None] * bg[None, None, :]
    sem = raw[:, :, 3:3 + s]
    depth = raw[:, :, 3 + s]
    return color, sem, depth, 1.0 - t_final
