"""Tiled processing for very large fields (4k x 4k coadds and beyond).

The reference "scales" fields only through its per-source Python loop over a
single 259x259 image (SURVEY.md §5 long-context analogue); memory and compile
-shape constraints make that a dead end for survey coadds.  Here:

- **Detection** runs per tile: the field is padded to a grid of fixed-size
  overlapping tiles, the jitted detection core (one compiled program for the
  tile shape) runs over the stack, and each tile keeps only peaks inside its
  *core* region (overlap/2 margin) — cores partition the plane, so the merge
  is exact with no cross-tile dedup heuristics.
- **Deblending** reuses the batched stamp pipeline: cutout extraction is a
  dynamic-slice gather on the full field (HBM-resident; a 4k x 4k x 6
  float32 field is ~0.4 GB), and the VAE forward runs in bucketed batches.
- **Residual assembly** is the same single-scan scatter-add render.

Tile size and overlap come from PipelineConfig (tile_size=1024,
tile_overlap=64).  Tiles are also the unit that shards across chips for
multi-device field deblending (the 'data' mesh axis).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from debvader_tpu.config import DetectionConfig
from debvader_tpu.ops.detection import detect_sources_batched
from debvader_tpu.pipeline.field import DeblendField

__all__ = ["tile_origins", "detect_objects_tiled", "TiledDeblendField"]


@partial(jax.jit, static_argnames=("band", "origins", "tile"))
def _tile_stack(field, band, origins, tile):
    """Leading-axis drop + band-select + overlapping tile-stack in ONE
    jitted dispatch.  Eager per-tile slicing costs a host-link round trip
    per op through a remote-attached device, which dominates the device
    compute at survey scale (measured ~2-4 s of dispatch for 25 tiles at
    4k through this environment's tunnel)."""
    if field.ndim == 4:
        field = field[0]
    if field.ndim == 3:
        field = field[..., band]
    return jnp.stack(
        [
            jax.lax.dynamic_slice(field, (oy, ox), (tile, tile))
            for oy, ox in origins
        ]
    )


def tile_origins(field_size: int, tile: int, overlap: int) -> list[int]:
    """Start offsets of overlapping tiles covering [0, field_size)."""
    if tile >= field_size:
        return [0]
    stride = tile - overlap
    starts = list(range(0, field_size - tile, stride))
    starts.append(field_size - tile)  # final tile flush with the edge
    return starts


def detect_objects_tiled(
    field_image,
    det_cfg: DetectionConfig | None = None,
    tile: int = 1024,
    overlap: int = 64,
    mesh=None,
    timings=None,
) -> np.ndarray:
    """Tiled drop-in for detect_objects: (N, 2) offsets from field center.

    Each tile's detections are filtered to its core region
    [origin + overlap/2, origin + tile - overlap/2) (extended to the field
    edge for border tiles), so every source is reported exactly once.

    All tiles run as ONE batched device pass (the detection core is vmapped
    over the tile stack); with ``mesh`` the stack is sharded over the 'data'
    axis so detection fans out across chips.

    ``timings``: optional dict accumulating per-stage wall seconds (the
    detect_sources_batched stages plus 'tile_select').
    """
    det_cfg = det_cfg or DetectionConfig()
    # A device-resident field (e.g. the running residual of the streaming
    # iterative deblender, or the serving drivers' memoized full-field
    # copy) is sliced on device inside the jitted _tile_stack — never
    # forced through the host link just to detect on it.  A host field is
    # band-selected in numpy first so only the detection band is uploaded.
    on_device = isinstance(field_image, jnp.ndarray)
    if on_device:
        img = field_image
        shape = img.shape[1:] if img.ndim == 4 else img.shape
        nb = shape[-1] if len(shape) == 3 else None
        band = (
            det_cfg.detection_band
            if nb is not None and nb > det_cfg.detection_band
            else 0
        )
        f = shape[0]
    else:
        img = np.asarray(field_image, np.float32)
        if img.ndim == 4:
            img = img[0]
        if img.ndim == 3:
            b = det_cfg.detection_band if img.shape[-1] > det_cfg.detection_band else 0
            img = img[..., b]
        band = 0  # already 2D
        f = img.shape[0]
        shape = img.shape
    if shape[0] != shape[1]:
        raise ValueError(
            f"detection requires a square field (got {tuple(shape[:2])}); "
            f"the tiling grid and center-offset convention are single-axis "
            f"— crop or zero-pad to square (a rectangular field would "
            f"silently drop sources outside the leading-axis extent)"
        )
    half = int(f / 2)

    if tile >= f:
        # Single-tile fields still go through the batched device core (a
        # stack of one) — np.asarray here would force a device->host copy
        # of the running residual every iterative step.
        subs = _tile_stack(img, band, ((0, 0),), f)
        # catalog-only: skip each tile's dense label-map rebuild (the one
        # O(F^2) host stage left in detection postprocess)
        obj = detect_sources_batched(
            subs, det_cfg, mesh=mesh, timings=timings, want_map=False
        )[0]
        if len(obj["y"]) == 0:
            return np.zeros((0, 2))
        return np.stack(
            [np.round(-half + obj["y"]), np.round(-half + obj["x"])], axis=-1
        )

    ys = tile_origins(f, tile, overlap)
    xs = tile_origins(f, tile, overlap)

    def core_bounds(origins: list[int]) -> list[tuple[float, float]]:
        """Exact partition of [0, f): boundaries at the midpoints of
        consecutive tiles' overlap regions (robust to the irregular stride
        of the flush-to-edge last tile)."""
        cuts = [0.0]
        for a, b in zip(origins[:-1], origins[1:]):
            cuts.append((b + a + tile) / 2.0)
        cuts.append(float(f))
        return list(zip(cuts[:-1], cuts[1:]))

    y_cores = core_bounds(ys)
    x_cores = core_bounds(xs)

    # Upload the field once (host inputs: the 2D detection band only) and
    # slice the (overlapping) tiles on device in one jitted dispatch — a
    # host-side stack re-copies the overlap regions and ships ~1.5x the
    # field over the host link.
    origins = tuple((oy, ox) for oy in ys for ox in xs)
    subs = _tile_stack(img, band, origins, tile)
    objs = detect_sources_batched(
        subs, det_cfg, mesh=mesh, timings=timings, want_map=False
    )

    from debvader_tpu.utils.profiling import stage_timer

    out = []
    k = 0
    with stage_timer(timings if timings is not None else {}, "tile_select"):
        for oy, (y_lo, y_hi) in zip(ys, y_cores):
            for ox, (x_lo, x_hi) in zip(xs, x_cores):
                obj = objs[k]
                k += 1
                if len(obj["y"]) == 0:
                    continue
                gy = obj["y"] + oy
                gx = obj["x"] + ox
                keep = (gy >= y_lo) & (gy < y_hi) & (gx >= x_lo) & (gx < x_hi)
                for yy, xx in zip(gy[keep], gx[keep]):
                    out.append((np.round(-half + yy), np.round(-half + xx)))
    if not out:
        return np.zeros((0, 2))
    return np.asarray(out)


class TiledDeblendField(DeblendField):
    """DeblendField for fields larger than one detection program.

    Overrides nothing in the deblending path (extraction/forward/render are
    already size-generic); adds tiled detection and a convenience
    ``detect_and_deblend`` driver.
    """

    def __init__(self, *args, det_cfg: DetectionConfig | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.det_cfg = det_cfg or DetectionConfig()

    def detect(self, timings=None, field=None) -> np.ndarray:
        """Tiled detection; per-stage wall times land in ``timings`` (or
        ``self.detect_timings`` when not supplied).

        ``field``: optional device-resident field to detect on instead of
        uploading the detection band from ``self.field_image`` — the
        serving drivers pass the memoized full-field device copy they need
        anyway, so detection costs no host->device transfer of its own."""
        t = timings if timings is not None else {}
        centers = detect_objects_tiled(
            self.field_image if field is None else field,
            self.det_cfg,
            tile=self.cfg.tile_size,
            overlap=self.cfg.tile_overlap,
            mesh=self.mesh,
            timings=t,
        )
        self.detect_timings = t
        return centers

    def detect_and_deblend(self, **kwargs):
        centers = self.detect(field=self._device_field(self.field_image))
        if len(centers) == 0:
            return None
        return self.deblend_field(centers, **kwargs)

    def detect_deblend_render(self, **kwargs):
        """End-to-end survey serving: tiled detection, then the device-
        resident deblend_and_render driver — only the catalog scalars and
        the final residual/model field cross the host link."""
        # Upload the full field once (the streaming deblender needs it for
        # extraction/render regardless) and detect on the device copy —
        # detection's own band upload disappears and the memoized copy is
        # reused by deblend_and_render.
        centers = self.detect(field=self._device_field(self.field_image))
        if len(centers) == 0:
            if kwargs.get("return_model"):
                return None, self.field_image.copy(), np.zeros_like(self.field_image[0])
            return None, self.field_image.copy()
        return self.deblend_and_render(centers, **kwargs)
