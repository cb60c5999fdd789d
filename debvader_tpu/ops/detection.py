"""Source detection: a JAX/TPU-native SExtractor-equivalent.

Replaces the ``sep`` C library the reference calls at
detect/detection.py:2,15,37 with on-device kernels (SURVEY.md §2 "Native
dependencies"):

1. **Background/RMS mesh** (sep.Background defaults: 64x64 boxes, 3x3 mesh
   median filter): per-box sigma-clipped statistics with the SExtractor mode
   estimator (2.5*median - 1.5*mean, falling back to the median in crowded
   boxes), median-smoothed and bilinearly interpolated to full resolution.
2. **Matched filter**: the reference's hardcoded 7x7 Gaussian (FWHM 3 px,
   detection.py:25-35) convolved over the background-subtracted detection
   band; the detection threshold is ``thresh * globalrms * ||k||_2`` — the
   correct significance scaling for an unnormalized matched filter.
3. **Segmentation + deblending**: instead of the Lutz scan + 64-level
   multi-threshold tree (inherently sequential C code), a steepest-ascent
   watershed: every above-threshold pixel points at its best 3x3 neighbor
   (lexicographic (value, -index) so plateaus are acyclic), local maxima are
   object seeds, and pointer-jumping resolves each pixel's attracting peak
   in O(log n) gathers.  With the reference's deblend_cont=1e-5 (any
   contrast splits), peak-splitting is the behavior SExtractor's
   deblender converges to; the saddle-contrast merge for larger cont values
   is applied as a post-filter.
4. **minarea + centroids**: per-segment areas and flux-weighted barycenters
   via scatter-adds.

The jitted core returns fixed-shape per-pixel maps; the host wrapper
materializes the (N, 2) offsets-from-field-center array with the reference's
rounding convention (detection.py:48-56).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from debvader_tpu.config import DetectionConfig

__all__ = [
    "detect_objects",
    "detect_sources",
    "detect_sources_batched",
    "estimate_background",
    "default_filter_kernel",
]

# The stock SExtractor gauss_3.0_7x7.conv matched filter (pixel-integrated
# Gaussian, FWHM = 3 px) — the exact matrix the reference hardcodes at
# detection.py:25-35.  Other sizes/FWHMs are generated analytically with the
# same pixel-integration rule.
_GAUSS_3_7x7 = np.array(
    [
        [0.004963, 0.021388, 0.051328, 0.068707, 0.051328, 0.021388, 0.004963],
        [0.021388, 0.092163, 0.221178, 0.296069, 0.221178, 0.092163, 0.021388],
        [0.051328, 0.221178, 0.530797, 0.710525, 0.530797, 0.221178, 0.051328],
        [0.068707, 0.296069, 0.710525, 0.951108, 0.710525, 0.296069, 0.068707],
        [0.051328, 0.221178, 0.530797, 0.710525, 0.530797, 0.221178, 0.051328],
        [0.021388, 0.092163, 0.221178, 0.296069, 0.221178, 0.092163, 0.021388],
        [0.004963, 0.021388, 0.051328, 0.068707, 0.051328, 0.021388, 0.004963],
    ],
    dtype=np.float32,
)


def default_filter_kernel(size: int = 7, fwhm: float = 3.0) -> np.ndarray:
    if size == 7 and fwhm == 3.0:
        return _GAUSS_3_7x7
    from scipy.special import erf

    sigma = fwhm / 2.3548200450309493
    r = np.arange(size) - size // 2
    one_d = erf((r + 0.5) / (sigma * np.sqrt(2))) - erf((r - 0.5) / (sigma * np.sqrt(2)))
    g = one_d[:, None] * one_d[None, :]
    return (g / g.max() * 0.951108).astype(np.float32)


def _sigma_clipped_stats(boxes: jax.Array, iters: int = 3, valid=None):
    """boxes: (G, G, P) pixels per mesh box -> (mean, median, std) clipped.

    ``valid``: optional (G, G, P) float mask of usable pixels (non-finite
    pixels — chip gaps, saturation — enter as 0 with valid=0 and never
    rejoin the statistics).

    Each clip iteration's membership is ``valid & |x - med| <= 3*std +
    1e-12`` — a VALUE interval recomputed from scratch every round — so
    instead of re-sorting every box per iteration (the naive formulation:
    iters+1 = 4 full sorts, measured as ~3/4 of the whole fused detect
    core's device time at the 16x1024^2 production shape) the pixels are
    sorted ONCE with invalid -> +inf (valid values form a prefix), and each
    iteration reduces to two predicate-count passes locating the clip
    interval [a, b) in sorted order, prefix-sum differences for mean and
    variance, and one gather for the median.  The selected subset, the
    median index ((count-1)//2 in the subset's sorted order) and the
    empty-mask resurrection quirk (an empty clip admits genuinely
    zero-valued pixels next round, |x| <= 1e-12) are exactly the naive
    formulation's; only float summation order differs."""
    if valid is None:
        valid = jnp.ones_like(boxes)
    p = boxes.shape[-1]
    vm = valid > 0
    cnt_all = vm.sum(-1).astype(jnp.int32)
    s = jnp.sort(jnp.where(vm, boxes, jnp.inf), axis=-1)
    finite = jnp.isfinite(s)
    # Center the prefix sums on the unclipped mean so the variance's
    # sum-of-squares difference stays well-conditioned in float32.
    c = jnp.where(finite, s, 0.0).sum(-1) / jnp.maximum(cnt_all, 1)
    y = jnp.where(finite, s - c[..., None], 0.0)
    zero = jnp.zeros_like(y[..., :1])
    ps = jnp.concatenate([zero, jnp.cumsum(y, -1)], -1)
    ps2 = jnp.concatenate([zero, jnp.cumsum(y * y, -1)], -1)

    def take(t, i):
        return jnp.take_along_axis(t, i[..., None], -1)[..., 0]

    def range_stats(a, b):
        n = jnp.maximum(b - a, 1)
        mean_y = (take(ps, b) - take(ps, a)) / n
        var = jnp.maximum((take(ps2, b) - take(ps2, a)) / n - jnp.square(mean_y), 0.0)
        midx = jnp.clip(a + jnp.maximum(b - a - 1, 0) // 2, 0, p - 1)
        med = jnp.where(b > a, take(s, midx), 0.0)
        mean = jnp.where(b > a, mean_y + c, 0.0)
        return mean, med, jnp.sqrt(var)

    def one_iter(state, _):
        a, b = state
        _, med, std = range_stats(a, b)
        thr = 3.0 * std + 1e-12
        a2 = jnp.sum(s < (med - thr)[..., None], -1).astype(jnp.int32)
        b2 = jnp.sum(s <= (med + thr)[..., None], -1).astype(jnp.int32)
        return (a2, b2), None

    (a, b), _ = jax.lax.scan(
        one_iter, (jnp.zeros_like(cnt_all), cnt_all), None, length=iters
    )
    return range_stats(a, b)


def _masked_median(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Median of masked values per row: sort with +inf for masked-out, pick
    the (count-1)/2 quantile index."""
    big = jnp.where(mask > 0, x, jnp.inf)
    s = jnp.sort(big, axis=-1)
    cnt = mask.sum(-1).astype(jnp.int32)
    idx = jnp.maximum((cnt - 1) // 2, 0)
    med = jnp.take_along_axis(s, idx[..., None], axis=-1)[..., 0]
    return jnp.where(cnt > 0, med, 0.0)  # fully-masked box -> 0, not inf


def _median3x3(mesh: jax.Array) -> jax.Array:
    """3x3 median filter with edge padding (sep's fw=fh=3 mesh smoothing)."""
    p = jnp.pad(mesh, 1, mode="edge")
    stack = jnp.stack(
        [p[i : i + mesh.shape[0], j : j + mesh.shape[1]] for i in range(3) for j in range(3)]
    )
    return jnp.sort(stack, axis=0)[4]


@partial(jax.jit, static_argnames=("box", "use_pallas"))
def estimate_background(image: jax.Array, box: int = 64, use_pallas: bool | None = None):
    """(back_map, rms_map, globalback, globalrms) for a 2D image.

    Non-finite pixels (chip gaps, saturation — routine in survey coadds;
    sep takes them via its mask argument) are excluded from the box
    statistics rather than poisoning the whole mesh.

    ``use_pallas``: run the box sigma-clip through the sort-free Pallas
    counting-selection kernel (kernels/clipped_stats.py, ~3x the XLA
    sort-once path at the 16x1024^2 production shape).  None (default)
    enables it on TPU backends; results differ from the XLA path only by
    float summation order (medians are exact rank statistics in both)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    f = image.shape[0]
    finite = jnp.isfinite(image)
    image = jnp.where(finite, image, 0.0)
    g = -(-f // box)  # cdiv
    pad = g * box - f
    padded = jnp.pad(image, ((0, pad), (0, pad)), mode="edge")
    fpad = jnp.pad(finite, ((0, pad), (0, pad)), mode="edge")

    def to_boxes(x):
        return x.reshape(g, box, g, box).transpose(0, 2, 1, 3).reshape(g, g, box * box)

    boxes = to_boxes(padded)
    valid = to_boxes(fpad.astype(jnp.float32))

    if use_pallas:
        from debvader_tpu.kernels.clipped_stats import sigma_clipped_stats_pallas

        # forced-on off-TPU (tests) runs the kernel interpreter, like the
        # other detection kernels
        mean, med, std = sigma_clipped_stats_pallas(
            boxes, valid, interpret=jax.default_backend() != "tpu"
        )
    else:
        mean, med, std = _sigma_clipped_stats(boxes, valid=valid)
    has_data = valid.sum(-1) > 0
    # SExtractor mode estimator; crowded boxes fall back to the median.
    mode = 2.5 * med - 1.5 * mean
    crowded = jnp.abs(mean - med) > 0.3 * (std + 1e-12)
    back_mesh = jnp.where(crowded, med, mode)
    rms_mesh = std

    # Boxes with zero valid pixels (a chip gap covering the whole box)
    # would otherwise enter the meshes and the global medians as 0,
    # dragging the background estimate down across the valid area (sep
    # interpolates masked mesh cells the same way).  Fill them with the
    # median over boxes that do have data.
    has_flat = has_data.reshape(1, 1, -1).astype(jnp.float32)

    def fill_gaps(mesh):
        fallback = _masked_median(mesh.reshape(1, 1, -1), has_flat)[0, 0]
        return jnp.where(has_data, mesh, fallback)

    back_mesh = fill_gaps(back_mesh)
    rms_mesh = fill_gaps(rms_mesh)

    back_mesh = _median3x3(back_mesh)
    rms_mesh = _median3x3(rms_mesh)

    up = (g * box, g * box)
    back = jax.image.resize(back_mesh, up, method="bilinear")[:f, :f]
    rms = jax.image.resize(rms_mesh, up, method="bilinear")[:f, :f]
    globalback = jnp.median(back_mesh)
    globalrms = jnp.median(rms_mesh)
    return back, rms, globalback, globalrms


def _conv2d_same(image: jax.Array, kernel: jax.Array) -> jax.Array:
    return jax.lax.conv_general_dilated(
        image[None, ..., None],
        kernel[..., None, None],
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0, ..., 0]


@partial(jax.jit, static_argnames=("cfg",))
def _detect_core(image: jax.Array, cfg: DetectionConfig):
    """Jitted detection on one 2D band.  Returns per-pixel maps:
    labels (flat peak index or -1), peak mask, filtered image, foreground."""
    f = image.shape[0]
    back, rms, globalback, globalrms = estimate_background(
        image, box=min(cfg.background_box, f), use_pallas=cfg.use_pallas_clip
    )
    # Non-finite pixels contribute zero to the matched filter (they are
    # excluded from the background stats too); a NaN would otherwise spread
    # through the conv footprint and erase real neighbors.
    fore = jnp.where(jnp.isfinite(image), image - back, 0.0)

    kernel_np = default_filter_kernel(cfg.filter_size, cfg.filter_fwhm)
    kernel = jnp.asarray(kernel_np)
    if cfg.threshold_scaling == "matched":
        scale = jnp.sqrt(jnp.sum(jnp.square(kernel)))
    elif cfg.threshold_scaling == "sep_conv":
        scale = jnp.float32(1.0)
    else:
        raise ValueError(f"unknown threshold_scaling {cfg.threshold_scaling!r}")
    threshold = cfg.thresh * globalrms * scale
    if cfg.use_pallas_filter and cfg.filter_size == 7:
        from debvader_tpu.kernels.matched_filter import matched_filter_threshold

        filt, maskf = matched_filter_threshold(
            jnp.where(jnp.isfinite(image), image, back),  # same NaN guard
            back,
            kernel_np,
            threshold,
            interpret=jax.default_backend() != "tpu",
        )
        mask = maskf > 0
    else:
        filt = _conv2d_same(fore, kernel)
        mask = filt > threshold

    # --- steepest-ascent parents over the 3x3 neighborhood ---------------
    flat_idx = (
        jax.lax.broadcasted_iota(jnp.int32, (f, f), 0) * f
        + jax.lax.broadcasted_iota(jnp.int32, (f, f), 1)
    )
    neg_inf = jnp.float32(-jnp.inf)
    val = jnp.where(mask, filt, neg_inf)

    best_val = val
    best_idx = flat_idx
    vp = jnp.pad(val, 1, constant_values=neg_inf)
    ip = jnp.pad(flat_idx, 1, constant_values=0)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nv = vp[1 + dy : 1 + dy + f, 1 + dx : 1 + dx + f]
            ni = ip[1 + dy : 1 + dy + f, 1 + dx : 1 + dx + f]
            better = (nv > best_val) | ((nv == best_val) & (ni < best_idx))
            best_val = jnp.where(better, nv, best_val)
            best_idx = jnp.where(better, ni, best_idx)

    parent = jnp.where(mask, best_idx, -1)
    is_peak = mask & (parent == flat_idx)

    # --- resolve each pixel's attracting peak ----------------------------
    # TPU gathers over the full field are ~100x slower than shifted
    # selects, so the ascent-path resolution runs as direction-coded
    # neighbor selects: parent is always one of the 9 neighbors, so
    # cur[parent] is a 9-way select over shifted copies of cur — pure VPU
    # traffic, one ancestor step per iteration.  Real basins are tens of
    # pixels wide; a capped while_loop to the fixpoint handles them, and a
    # gather-based pointer-jumping loop (log-step, expensive per step)
    # finishes any pathological longer-than-cap path.
    # direction code per pixel from the already-resolved parent index
    iy = jax.lax.broadcasted_iota(jnp.int32, (f, f), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (f, f), 1)
    pdy = jnp.clip(parent // f - iy, -1, 1)
    pdx = jnp.clip(parent % f - ix, -1, 1)
    dir_code = jnp.where(mask, (pdy + 1) * 3 + (pdx + 1), 4)  # 4 = self

    offsets = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]

    def select_step(cur):
        curp = jnp.pad(cur, 1)  # parents never point outside the mask
        acc = cur
        for code, (dy, dx) in enumerate(offsets):
            if dy == 0 and dx == 0:
                continue
            shifted = curp[1 + dy : 1 + dy + f, 1 + dx : 1 + dx + f]
            acc = jnp.where(dir_code == code, shifted, acc)
        return acc

    # The ascent forest is acyclic (strict (value, -index) order), so the
    # select iteration reaches its fixpoint in max-path-length steps —
    # uncapped while_loops terminate by construction.  No gather fallback:
    # a single full-field gather costs ~250 ms on TPU, and under vmap even
    # a lax.cond-guarded one always executes (cond batches to select).
    cur0 = jnp.where(mask, parent, 0)

    if cfg.use_pallas_select and jax.default_backend() == "tpu":
        # Fused Pallas chunks: K resolution steps per VMEM pass (the XLA
        # loop pays an HBM round trip + convergence reduction per step).
        from debvader_tpu.kernels.label_select import label_select_fixpoint

        pad_to = (-f) % 128
        cur_p = jnp.pad(cur0, ((0, pad_to), (0, pad_to)))
        dir_p = jnp.pad(dir_code, ((0, pad_to), (0, pad_to)), constant_values=4)
        nxt, _ = label_select_fixpoint(cur_p, dir_p, rows=128)
        nxt = nxt[:f, :f]
    else:
        def sel_cond(state):
            cur, nxt = state
            return jnp.any(cur != nxt)

        def sel_body(state):
            _, nxt = state
            return nxt, select_step(nxt)

        cur, nxt = jax.lax.while_loop(
            sel_cond, sel_body, (cur0, select_step(cur0))
        )

    labels = jnp.where(mask.ravel(), nxt.ravel(), -1).reshape(f, f)

    return labels, is_peak, filt, fore, globalrms


def _saddle_edges_coo(idx, lab, val, f):
    """Saddle triples (lo, hi, h) between touching segments, computed from
    the masked-pixel COO (ascending flat indices ``idx``, per-pixel labels,
    filtered values) instead of four dense (F, F) slice comparisons: for
    each unordered neighbor direction a pair exists where ``idx + d`` is
    also masked (found by one searchsorted per direction) with a different
    label; the saddle height is the smaller filtered value.  The pair set
    and heights are identical to the dense extraction (only the order
    differs, and the downstream per-pair scatter-max is order-independent).
    Returns (None, None, None) when no segments touch."""
    col = idx % f
    lo_parts, hi_parts, h_parts = [], [], []
    # (flat offset, source-pixel constraint) for E, S, SE, SW neighbors;
    # row overflow needs no mask (idx + d past f*f never matches).
    for d, ok in (
        (1, col < f - 1),
        (f, None),
        (f + 1, col < f - 1),
        (f - 1, col > 0),
    ):
        src = np.flatnonzero(ok) if ok is not None else np.arange(len(idx))
        cand = idx[src] + d
        pos = np.searchsorted(idx, cand)
        m = np.flatnonzero(pos < len(idx))
        m = m[idx[pos[m]] == cand[m]]
        i_src, i_dst = src[m], pos[m]
        t = lab[i_src] != lab[i_dst]
        if not t.any():
            continue
        la = lab[i_src[t]].astype(np.int64)
        lb = lab[i_dst[t]].astype(np.int64)
        lo_parts.append(np.minimum(la, lb))
        hi_parts.append(np.maximum(la, lb))
        h_parts.append(
            np.minimum(val[i_src[t]], val[i_dst[t]]).astype(np.float64)
        )
    if not lo_parts:
        return None, None, None
    return (
        np.concatenate(lo_parts),
        np.concatenate(hi_parts),
        np.concatenate(h_parts),
    )


def _merge_labels_coo(idx, lab, val, f, threshold, cfg: DetectionConfig):
    """SExtractor-style quantized deblending criterion on watershed segments.

    The reference's sep.extract uses 64 exponentially-spaced thresholds
    between the detection threshold and the island peak
    (detect/detection.py:20-21: deblend_nthresh=64, deblend_cont=1e-5); a
    local maximum only becomes a separate object if (a) at least one
    quantization level separates its peak from the saddle to its neighbor
    and (b) its flux exceeds deblend_cont x island flux.  The watershed
    splits at *every* strict local max; this pass merges back the splits
    sep would not have made.

    Operates on the masked-pixel COO (see _saddle_edges_coo) — the masked
    set is a few percent of the field, so every reduction here scans ~30x
    fewer elements than the dense formulation, which dominated the 8k host
    stage.  Merges apply weakest-peak-first.  Returns the relabeled
    per-pixel label array (``lab`` itself when nothing merges)."""
    if len(idx) == 0:
        return lab
    lo, hi, h = _saddle_edges_coo(idx, lab, val, f)
    if lo is None:
        return lab

    # Compact labels (flat peak indices) to 0..L-1 ids; max saddle height
    # per touching pair via a single unique/scatter-max pass.
    labs = np.unique(lab)
    L = len(labs)
    ia = np.searchsorted(labs, lo)
    ib = np.searchsorted(labs, hi)
    ukey, inv = np.unique(ia * L + ib, return_inverse=True)
    eh = np.full(len(ukey), -np.inf)
    np.maximum.at(eh, inv, h)
    ea = ukey // L
    eb = ukey % L

    # Per-segment peaks and positive fluxes via scatter-adds.  A peak pixel
    # is always masked (the parent chain ascends in filtered value from a
    # masked pixel), so its value comes straight from the COO.
    cid = np.searchsorted(labs, lab)
    flux = np.bincount(cid, weights=np.maximum(val, 0.0), minlength=L)
    peak = val[np.searchsorted(idx, labs)].astype(np.float64)

    nthr = max(cfg.deblend_nthresh, 1)
    thr = max(float(threshold), 1e-30)
    order = np.argsort(peak, kind="stable")  # weakest peaks first

    # The merge loop is inherently sequential (each merge rewires the
    # neighbor graph and updates fluxes before later decisions) — it runs
    # in the native core (runtime/segmerge.cpp, operation-identical, so
    # results are bit-identical), with the Python loop below as the
    # no-toolchain fallback.  At 4k-coadd scale the Python loop was ~1/3
    # of steady detection wall time (BASELINE.md r3).
    from debvader_tpu.runtime.segmerge import merge_segments

    roots = merge_segments(
        ea, eb, eh, peak, flux, order, nthr, thr, cfg.deblend_cont
    )
    if roots is None:
        roots = _merge_segments_py(
            ea, eb, eh, peak, flux.copy(), order, nthr, thr, cfg.deblend_cont
        )
    if np.array_equal(roots, np.arange(L)):
        return lab
    return labs[roots][cid]


def _pixel_edges_coo(idx, f):
    """8-neighbor pixel edge pairs (array indices) among the masked COO
    pixels — the E/S/SE/SW directions cover every undirected adjacency."""
    idx = np.asarray(idx, np.int64)
    col = idx % f
    a_parts, b_parts = [], []
    for d, ok in (
        (1, col < f - 1),
        (f, None),
        (f + 1, col < f - 1),
        (f - 1, col > 0),
    ):
        src = np.flatnonzero(ok) if ok is not None else np.arange(len(idx))
        cand = idx[src] + d
        pos = np.searchsorted(idx, cand)
        m = np.flatnonzero(pos < len(idx))
        m = m[idx[pos[m]] == cand[m]]
        if len(m):
            a_parts.append(src[m])
            b_parts.append(pos[m])
    if not a_parts:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return np.concatenate(a_parts), np.concatenate(b_parts)


def _lutz_labels_coo(idx, val, f, threshold, cfg: DetectionConfig):
    """sep-faithful multi-threshold tree deblending
    (DetectionConfig.deblend_algo='lutz'): islands are deblended by the
    native component-tree core (runtime/segmerge.cpp dvm_lutz) with the
    documented SExtractor criterion — ``deblend_nthresh`` exponential
    sub-thresholds, branch significance = flux > deblend_cont x island
    flux with >=2 significant siblings, bivariate-Gaussian gatherup.
    The watershed labels are bypassed entirely (the reference's
    sep.extract has no watershed stage, detect/detection.py:37-46)."""
    from debvader_tpu.runtime.segmerge import lutz_deblend

    if len(idx) == 0:
        return np.zeros(0, np.int64)
    ea, eb = _pixel_edges_coo(idx, f)
    lab = lutz_deblend(
        np.maximum(np.asarray(val, np.float64), 1e-30),
        idx,
        ea,
        eb,
        f,
        max(cfg.deblend_nthresh, 1),
        max(float(threshold), 1e-30),
        cfg.deblend_cont,
    )
    if lab is None:
        raise RuntimeError(
            "deblend_algo='lutz' needs the native segmerge library "
            "(runtime/segmerge.cpp) and it failed to build/load; the "
            "default 'watershed' algorithm has a pure-Python fallback"
        )
    return lab


def _multi_threshold_merge(labels, filt, threshold, cfg: DetectionConfig):
    """Dense (F, F) wrapper over the COO merge (_merge_labels_coo) — kept
    for single-field callers and direct tests; production tiled detection
    feeds the COO straight through _postprocess_coo."""
    f = labels.shape[0]
    flat = labels.ravel()
    sel = np.flatnonzero(flat >= 0)
    if len(sel) == 0:
        return labels
    lab2 = _merge_labels_coo(
        sel, flat[sel].astype(np.int64), filt.ravel()[sel], f, threshold, cfg
    )
    out_flat = flat.copy()
    out_flat[sel] = lab2
    return out_flat.reshape(f, f)


def _merge_segments_py(ea, eb, eh, peak, flux, order, nthr, thr, cont):
    """Pure-Python reference implementation of the merge loop (the native
    core in runtime/segmerge.cpp is an operation-for-operation translation
    of this; tests assert bit-identical roots).  Returns the roots array."""
    L = len(peak)

    def level(v, island_peak):
        if island_peak <= thr or v <= thr:
            return 0
        x = np.log(v / thr) / np.log(island_peak / thr)
        return int(np.clip(np.floor(x * nthr), 0, nthr))

    parent = np.arange(L)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    # Incident-edge index lists per segment; merged segments donate their
    # lists to the surviving root, so each root scans only its own
    # component's boundary instead of every saddle in the field.
    incident: list[list[int]] = [[] for _ in range(L)]
    for e in range(len(eh)):
        incident[ea[e]].append(e)
        incident[eb[e]].append(e)

    changed = True
    while changed:
        changed = False
        for r in order:
            r = int(r)
            if parent[r] != r:
                continue
            # best saddle to any touching neighbor (by current roots)
            best_other, best_h = -1, -np.inf
            for e in incident[r]:
                ra, rb = find(int(ea[e])), find(int(eb[e]))
                if ra == rb:
                    continue
                other = rb if ra == r else ra
                if eh[e] > best_h:
                    best_other, best_h = other, eh[e]
            if best_other < 0:
                continue
            if peak[best_other] < peak[r]:
                continue  # only merge into a brighter neighbor
            island_peak = max(peak[r], peak[best_other])
            island_flux = flux[r] + flux[best_other]
            separated = level(peak[r], island_peak) > level(best_h, island_peak)
            significant = flux[r] > cont * island_flux
            if not (separated and significant):
                parent[r] = best_other
                flux[best_other] += flux[r]
                incident[best_other].extend(incident[r])
                incident[r] = []
                changed = True

    return np.fromiter((find(i) for i in range(L)), np.int64, L)


def _normalize_batched_cfg(cfg: DetectionConfig) -> DetectionConfig:
    """Resolve single-field-only knobs for the batched/tiled path.

    The standalone Pallas filter (use_pallas_filter) is a single-field
    backend; in the batched path it is superseded by the fused detect core,
    which subsumes it (filter + threshold + parents in one pass).  Route
    through the fused stack instead of de-batching — unless the caller
    explicitly disabled the fused kernel or its Pallas label-select feeder
    (or it cannot run, e.g. filter_size != 7), in which case honor that and
    run the XLA filter batched."""
    if cfg.use_pallas_filter and not _fused_enabled(cfg):
        if (
            cfg.use_pallas_fused is None
            and cfg.filter_size == 7
            and cfg.use_pallas_select
        ):
            return dataclasses.replace(
                cfg, use_pallas_filter=False, use_pallas_fused=True
            )
        return dataclasses.replace(cfg, use_pallas_filter=False)
    return cfg


def _fused_enabled(cfg: DetectionConfig) -> bool:
    """Whether the fused Pallas detect core (kernels/detect_fused.py) runs:
    auto on TPU, forced (interpreter mode) by use_pallas_fused=True."""
    if cfg.filter_size != 7:
        return False
    if cfg.use_pallas_fused is None:
        # auto mode respects the label_select escape hatch: the fused core
        # feeds label_select_fixpoint, so use_pallas_select=False must fall
        # back to the XLA chain (an explicit use_pallas_fused=True still
        # wins — the user asked for the fused core by name)
        return jax.default_backend() == "tpu" and cfg.use_pallas_select
    return cfg.use_pallas_fused


@partial(jax.jit, static_argnames=("cfg",))
def _detect_core_stack(xs: jax.Array, cfg: DetectionConfig):
    """Fused detect core over a (T, F, F) stack: vmapped background mesh,
    then ONE Pallas pass (matched filter + threshold + watershed parents +
    direction codes, kernels/detect_fused.py) and the label-resolution
    fixpoint over the row-flattened stack.  Labels cannot cross fields —
    not because of pad rows between them (the padded size can equal F,
    leaving none) but because the parent race masks out-of-field neighbors
    to -inf, so no pixel's parent chain ever leaves its own field (see
    matched_filter_parents).  Returns (labels, filt, globalrms) with the
    same semantics as vmapped _detect_core."""
    from debvader_tpu.kernels.detect_fused import matched_filter_parents
    from debvader_tpu.kernels.label_select import label_select_fixpoint

    f = xs.shape[-1]
    back, rms, gback, grms = jax.vmap(
        lambda im: estimate_background(
            im, box=min(cfg.background_box, f), use_pallas=cfg.use_pallas_clip
        )
    )(xs)
    kernel_np = default_filter_kernel(cfg.filter_size, cfg.filter_fwhm)
    if cfg.threshold_scaling == "matched":
        scale = float(np.sqrt(np.sum(np.square(kernel_np))))
    elif cfg.threshold_scaling == "sep_conv":
        scale = 1.0
    else:
        raise ValueError(f"unknown threshold_scaling {cfg.threshold_scaling!r}")
    thr = cfg.thresh * grms * scale  # (T,)

    interpret = jax.default_backend() != "tpu"
    guarded = jnp.where(jnp.isfinite(xs), xs, back)
    filt_p, dir_p, cur_p = matched_filter_parents(
        guarded, back, kernel_np, thr, interpret=interpret
    )
    t, p = filt_p.shape[0], filt_p.shape[-1]
    nxt, _ = label_select_fixpoint(
        cur_p.reshape(t * p, p), dir_p.reshape(t * p, p), rows=128,
        interpret=interpret,
    )
    nxt = nxt.reshape(t, p, p)[:, :f, :f]
    filt = filt_p[:, :f, :f]
    labels = jnp.where(filt > thr[:, None, None], nxt, -1)
    return labels, filt, grms


def detect_sources(
    image_2d, cfg: DetectionConfig | None = None, timings=None, want_map=True
):
    """Full detection on a 2D band.  Returns dict with 'y', 'x' (float
    barycenters), 'area', 'flux', 'peak_yx', and the label map
    (``labels: None`` with ``want_map=False`` — skips the dense rebuild).

    ``timings``: optional dict accumulating the host-postprocess stage
    wall seconds ('merge', 'segstats', 'clean', 'reconstruct'); the device
    core is not split out here (see detect_sources_batched for that).

    Fields are square by contract — the whole pipeline's center-offset
    convention (and the reference's: detect/detection.py:48-56,
    extract/extraction.py both use one ``field_size``) is single-axis.  A
    rectangular field raises instead of silently mis-tiling; crop or pad
    to square first."""
    cfg = cfg or DetectionConfig()
    image = jnp.asarray(image_2d, jnp.float32)
    if image.shape[0] != image.shape[1]:
        raise ValueError(
            f"detection requires a square field (got {image.shape}); crop "
            f"or zero-pad to square — the center-offset convention is "
            f"single-axis (reference detect/detection.py:48-56)"
        )
    if _fused_enabled(cfg) and not cfg.use_pallas_filter:
        labels, filt, grms = _detect_core_stack(image[None], cfg)
        return _postprocess_core(
            np.asarray(labels[0]), np.asarray(filt[0]), float(grms[0]), cfg,
            timings=timings, want_map=want_map,
        )
    labels, is_peak, filt, fore, globalrms = _detect_core(image, cfg)
    return _postprocess_core(
        np.asarray(labels), np.asarray(filt), float(globalrms), cfg,
        timings=timings, want_map=want_map,
    )


def _postprocess_core(
    labels_np, filt_np, globalrms, cfg, timings=None, want_map=True
):
    """Host stage after the jitted core, dense-map entry point: derives the
    masked-pixel COO with one flatnonzero and delegates to
    :func:`_postprocess_coo` (every reduction then scans masked pixels
    only).  Tiled/sharded callers that already hold the COO download call
    _postprocess_coo directly."""
    f = labels_np.shape[0]
    flat = np.asarray(labels_np).ravel()
    sel = np.flatnonzero(flat >= 0)
    return _postprocess_coo(
        sel,
        flat[sel],
        np.asarray(filt_np).ravel()[sel],
        f,
        globalrms,
        cfg,
        timings=timings,
        want_map=want_map,
    )


def _postprocess_coo(idx, lab, val, f, globalrms, cfg, timings=None, want_map=True):
    """Host stage after the jitted core: multi-threshold merge, minarea,
    centroids, CLEAN — operating directly on the masked-pixel COO
    (ascending per-field flat indices ``idx``, per-pixel watershed labels,
    filtered values), which is exactly what the device compaction downloads.
    The masked set is a few percent of the field, so no stage ever scans a
    dense (F, F) map; the previous dense formulation's 4-direction saddle
    slices and full-size bincounts dominated 8k-coadd host time.

    Peaks are derived from the labels (a pixel is a peak iff it is its own
    pointer-jumping fixpoint; merged-away peaks lose that property during
    relabeling), so the core's is_peak output never needs a transfer.

    ``timings``: optional dict accumulating per-stage wall seconds
    ('merge', 'segstats', 'clean', 'reconstruct' — the last is the single
    scatter rebuilding the dense label map for the result schema).

    ``want_map=False`` skips that rebuild and returns ``labels: None`` —
    catalog-only callers (the tiled survey driver reads just y/x) should
    pass it: the scatter allocates and fills a dense (F, F) int32 per
    tile, the one remaining O(F^2) host cost (1.9 s of the 3.2 s host
    postprocess at 12k/35k-source scale).
    """
    from debvader_tpu.utils.profiling import stage_timer

    t = timings if timings is not None else {}
    idx = np.asarray(idx, np.int64)
    lab = np.asarray(lab, np.int64)
    val = np.asarray(val, np.float32)
    # Quantized multi-threshold deblending criterion (sep's
    # deblend_nthresh/deblend_cont) applied to the watershed splits.
    if cfg.threshold_scaling == "matched":
        knorm = float(
            np.sqrt((default_filter_kernel(cfg.filter_size, cfg.filter_fwhm) ** 2).sum())
        )
    else:
        knorm = 1.0
    thr_val = cfg.thresh * float(globalrms) * knorm
    with stage_timer(t, "merge"):
        if cfg.deblend_algo == "lutz":
            lab = _lutz_labels_coo(idx, val, f, thr_val, cfg)
        else:
            lab = _merge_labels_coo(idx, lab, val, f, thr_val, cfg)

    with stage_timer(t, "segstats"):
        w_sel = np.maximum(val, 0.0)
        ulab = np.unique(lab)
        nl = len(ulab)
        cid = np.searchsorted(ulab, lab)
        area = np.bincount(cid, minlength=nl).astype(np.float64)
        flux = np.bincount(cid, weights=w_sel, minlength=nl)
        ysum = np.bincount(cid, weights=w_sel * (idx // f), minlength=nl)
        xsum = np.bincount(cid, weights=w_sel * (idx % f), minlength=nl)

        peak_flat = idx[lab == idx]  # pointer-jumping fixpoints = peaks
        pcid = np.searchsorted(ulab, peak_flat)
        kmask = area[pcid] >= cfg.minarea
        keep = peak_flat[kmask]
        kcid = pcid[kmask]
        fl = np.maximum(flux[kcid], 1e-30)
        ys = ysum[kcid] / fl
        xs = xsum[kcid] / fl
        peak_val = val[np.searchsorted(idx, keep)]

    if cfg.clean and len(keep) > 1:
        with stage_timer(t, "clean"):
            keep_mask = _clean_pass(ys, xs, peak_val, cfg)
            keep = keep[keep_mask]
            kcid = kcid[keep_mask]
            ys, xs = ys[keep_mask], xs[keep_mask]

    if want_map:
        with stage_timer(t, "reconstruct"):
            dense = np.full(f * f, -1, np.int32)
            dense[idx] = lab
            dense = dense.reshape(f, f)
    else:
        dense = None

    return {
        "y": ys,
        "x": xs,
        "area": area[kcid],
        "flux": flux[kcid],
        "peak_yx": np.stack([keep // f, keep % f], -1) if len(keep) else np.zeros((0, 2), int),
        "labels": dense,
        "globalrms": float(globalrms),
    }


@lru_cache(maxsize=8)
def _batched_core_fn(cfg: DetectionConfig, mesh):
    """Jitted vmapped detection core, optionally sharded over the mesh's
    'data' axis (cached per (cfg, mesh) so repeat calls don't recompile).

    Besides the dense per-pixel maps this also emits a device-side COO
    compaction of the masked pixels — (global flat index, label, filtered
    value) plus a count — sized at 1/8 of the stack.  The host postprocess
    only ever reads masked pixels (a few percent of the field), so
    downloading the compacted triples instead of the dense label/filt maps
    cuts the device->host traffic ~100x; on a 4k coadd the dense transfer
    was 95% of steady-state detection wall time.  The compaction is fused
    across the whole tile stack (one count sync + three bulk copies —
    per-tile downloads pay a host-link round trip each); a stack whose
    masked count overflows the buffer falls back to the dense download.
    """

    def fn(xs):
        if mesh is None and _fused_enabled(cfg):
            labels, filt, grms = _detect_core_stack(xs, cfg)
        elif mesh is not None and _fused_enabled(cfg):
            # Every stage of the fused core is per-tile independent
            # (per-tile background/threshold, intra-tile watershed whose
            # parent race never leaves the field, per-field flat parent
            # indices), so
            # the stack shards over 'data' with no collectives: shard_map
            # hands each device its local (T/n, F, F) slab and the Pallas
            # kernels run per shard.  The caller pads T to a multiple of
            # the 'data' axis.
            from jax.sharding import PartitionSpec as P

            labels, filt, grms = jax.shard_map(
                lambda x: _detect_core_stack(x, cfg),
                mesh=mesh,
                in_specs=P("data"),
                out_specs=P("data"),
                # vma inference can't see through the pallas_calls inside
                # the core; outputs are per-shard by construction
                check_vma=False,
            )(xs)
        else:
            # XLA core: XLA SPMD partitions the vmapped ops over 'data'.
            if mesh is not None:
                from debvader_tpu.parallel import mesh as mesh_lib

                xs = jax.lax.with_sharding_constraint(
                    xs, mesh_lib.batch_sharding(mesh)
                )
            labels, is_peak, filt, fore, grms = jax.vmap(
                lambda im: _detect_core(im, cfg)
            )(xs)
        # ONE compaction over the whole tile stack (global flat indices):
        # per-tile COO downloads pay a host-link round trip per tile; the
        # fused version costs one count sync plus three bulk copies.
        k = _compact_k(xs.shape[-1]) * xs.shape[0]
        idx, lab, val, count = _compact_masked(labels, filt, k)
        return labels, filt, grms, idx, lab, val, count

    return jax.jit(fn)


def _compact_k(f: int) -> int:
    """Static COO-compaction capacity for an (f, f) tile."""
    return max(4096, (f * f) // 8)


@partial(jax.jit, static_argnames=("k",))
def _compact_masked_jit(labels: jax.Array, filt: jax.Array, k: int):
    return _compact_masked(labels, filt, k)


def _compact_masked(labels: jax.Array, filt: jax.Array, k: int):
    """Device-side COO view of the masked pixels of a tile or tile stack:
    (idx, lab, val, count) where idx is the flat (ascending) pixel index
    into ``labels.ravel()`` (-1 past count)."""
    flat = labels.ravel()
    mask = flat >= 0
    count = mask.sum(dtype=jnp.int32)
    idx = jnp.flatnonzero(mask, size=k, fill_value=-1).astype(jnp.int32)
    safe = jnp.maximum(idx, 0)
    lab = jnp.where(idx >= 0, flat[safe], -1)
    val = jnp.where(idx >= 0, filt.ravel()[safe], 0.0)
    return idx, lab, val, count


def detect_sources_batched(
    tiles, cfg: DetectionConfig | None = None, mesh=None, timings=None,
    want_map=True,
) -> list[dict]:
    """Detection over a stack of same-size tiles (T, F, F): one batched —
    and, with ``mesh``, 'data'-axis-sharded — device pass for the cores,
    then the host postprocess per tile.  Returns a list of per-tile result
    dicts with the ``detect_sources`` schema.  This is how tiled survey
    fields fan detection out across chips (SURVEY.md §5 long-context row).

    ``timings``: optional dict accumulating per-stage wall seconds — 'core'
    (device detect incl. the count sync), 'download' (COO device->host),
    plus the _postprocess_coo stages ('merge', 'segstats', 'clean',
    'reconstruct' — the result-schema dense-label scatter).

    ``want_map=False`` skips each tile's dense label-map rebuild
    (``labels: None`` in the results) — see _postprocess_coo.
    """
    cfg = cfg or DetectionConfig()
    shape = np.shape(tiles)
    if len(shape) != 3 or shape[1] != shape[2]:
        raise ValueError(
            f"detection tiles must be a (T, F, F) square stack (got "
            f"{shape}); see detect_sources for the square-field contract"
        )
    n_padded = shape[0]
    if mesh is not None:
        n_padded += (-shape[0]) % mesh.shape["data"]
    cfg = _normalize_batched_cfg(cfg)
    if n_padded * int(np.prod(shape[1:])) >= 2**31:
        # stacks past 2^31 pixels (after mesh padding) would overflow the
        # int32 COO flat index; the per-tile path honors want_map/timings
        # so the fallback doesn't silently restore the dense label rebuild
        return [
            detect_sources(t, cfg, timings=timings, want_map=want_map)
            for t in np.asarray(tiles)
        ]
    from debvader_tpu.utils.profiling import stage_timer

    t = timings if timings is not None else {}
    x = jnp.asarray(tiles, jnp.float32)
    n = x.shape[0]
    if mesh is not None:
        pad = (-n) % mesh.shape["data"]
        if pad:
            # cyclic repeat: pad can exceed n (e.g. 3 tiles on an 8-chip
            # mesh needs 5 pad rows), where a plain x[:pad] underfills and
            # shard_map rejects the non-divisible stack
            x = jnp.concatenate([x, x[jnp.arange(pad) % n]])
    with stage_timer(t, "core"):
        labels, filt, grms, idx, lab, val, count = _batched_core_fn(cfg, mesh)(x)
        c = int(count)  # one scalar sync for the whole stack
    f = x.shape[-1]
    k = _compact_k(f) * x.shape[0]
    grms = np.asarray(grms)

    if c > k:
        # Compaction overflow (dense mask, e.g. a low threshold admitting
        # noise peaks): the maps are still on device, so re-compact with a
        # buffer sized to the now-known count (rounded up to a power of two
        # to bound recompiles) — still ~8x less traffic than dense maps.
        k = 1 << (c - 1).bit_length()
        with stage_timer(t, "core"):
            idx, lab, val, _ = _compact_masked_jit(labels, filt, k=k)

    # Three bulk D2H copies of the [:count] COO slices for ALL tiles
    # (global ascending flat indices), then per-tile COO postprocess —
    # the dense label/filt maps are never rebuilt on the host (only the
    # result schema's label map, one scatter inside _postprocess_coo).
    with stage_timer(t, "download"):
        idx_np, lab_np, val_np = jax.device_get((idx[:c], lab[:c], val[:c]))
    per_tile = f * f
    bounds = np.searchsorted(idx_np, np.arange(n + 1) * per_tile)
    out = []
    for i in range(n):
        s, e = bounds[i], bounds[i + 1]
        out.append(
            _postprocess_coo(
                idx_np[s:e].astype(np.int64) - i * per_tile,
                lab_np[s:e],
                val_np[s:e],
                f,
                float(grms[i]),
                cfg,
                timings=t,
                want_map=want_map,
            )
        )
    return out


def _clean_pass(ys, xs, peaks, cfg: DetectionConfig) -> np.ndarray:
    """SExtractor-style CLEAN (sep clean=True, clean_param=1.0 — the
    reference's effective defaults): a detection is spurious if the summed
    PSF-wing contribution of brighter detections at its position exceeds
    its own peak times clean_param.  We model wings with the matched
    filter's Gaussian (FWHM from cfg), which is the same PSF model the
    reference's kernel encodes."""
    sigma = cfg.filter_fwhm / 2.3548200450309493
    # filtering a PSF with itself widens it: sqrt(2) sigma
    s2 = 2.0 * (np.sqrt(2.0) * sigma) ** 2
    n = len(ys)
    # Wings are Gaussian: beyond rcut every dropped term is < 1e-12 *
    # min(peak) / n, so the summed contribution (and therefore the keep
    # decision) is unchanged to double precision.  This turns the pairwise
    # pass near-linear on survey fields instead of O(N^2).
    pmax, pmin = float(peaks.max()), float(max(peaks.min(), 1e-300))
    rcut = np.sqrt(s2 * (np.log(pmax / pmin) + np.log(max(n, 2)) + 28.0))
    order = np.argsort(xs, kind="stable")
    ys_s, xs_s, pk_s = ys[order], xs[order], peaks[order]
    contrib_s = np.zeros(n)
    chunk = 512
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        j0 = int(np.searchsorted(xs_s, xs_s[s] - rcut, "left"))
        j1 = int(np.searchsorted(xs_s, xs_s[e - 1] + rcut, "right"))
        d2 = (ys_s[s:e, None] - ys_s[None, j0:j1]) ** 2 + (
            xs_s[s:e, None] - xs_s[None, j0:j1]
        ) ** 2
        wings = pk_s[None, j0:j1] * np.exp(-d2 / s2)
        brighter = pk_s[None, j0:j1] > pk_s[s:e, None]  # strict: self is False
        contrib_s[s:e] = np.where(brighter, wings, 0.0).sum(axis=1)
    contrib = np.empty(n)
    contrib[order] = contrib_s
    return peaks > cfg.clean_param * contrib


def detect_objects(field_image, cfg: DetectionConfig | None = None) -> np.ndarray:
    """Reference-signature detection (detect/detection.py:5-56).

    field_image: (1, F, F, B), (F, F, B) or (F, F); detection runs on the r
    band (channel 2 when present).  Returns (N, 2) rounded offsets of each
    source from the field center: round(-int(F/2) + y), matching the
    reference's convention.
    """
    cfg = cfg or DetectionConfig()
    img = np.asarray(field_image, np.float32)
    if img.ndim == 4:
        img = img[0]
    if img.ndim == 3:
        band = cfg.detection_band if img.shape[-1] > cfg.detection_band else 0
        img = img[..., band]
    field_size = img.shape[0]

    objects = detect_sources(img, cfg)
    if len(objects["y"]) == 0:
        return np.zeros((0, 2))
    half = int(field_size / 2)
    return np.stack(
        [
            np.round(-half + objects["y"]),
            np.round(-half + objects["x"]),
        ],
        axis=-1,
    )
