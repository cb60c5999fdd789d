"""Iterative detect -> deblend -> subtract scene deblending.

Rebuild of the reference ``IterativeDeblendField``
(deblend_iterative/iterative_deblender.py:8-152) with the same control flow
and termination semantics:

- first step deblends the raw field (optionally with given centers/cutouts);
- each further step runs detection on the *residual* field and deblends the
  new sources;
- the loop continues while a step finds strictly more shifts than the
  previous one (iterative_deblender.py:58);
- a step that deblends zero new galaxies returns the whole accumulated
  recarray (iterative_deblender.py:141-143 quirk, preserved);
- ``list_idx`` of each step is offset by the number of galaxies already
  found (iterative_deblender.py:145-147).

Detection runs the JAX sep-equivalent (ops/detection.py) instead of the C
library.
"""

from __future__ import annotations

import numpy as np

from debvader_tpu.ops.detection import detect_objects
from debvader_tpu.pipeline.field import DeblendField

__all__ = ["IterativeDeblendField"]


def _mse(a, b) -> float:
    return float(np.mean(np.square(np.asarray(a) - np.asarray(b))))


class IterativeDeblendField(DeblendField):
    def iterative_deblending(
        self,
        galaxy_distances_to_center=None,
        cutout_images=None,
        optimise_positions: bool = False,
        epistemic_criterion: float = 100.0,
        mse_criterion: float = 100.0,
        cumulative_residual: bool = False,
    ):
        """Detect-subtract-repeat until no new sources appear
        (iterative_deblender.py:21-99).

        ``cumulative_residual``: the reference computes each step's residual
        by subtracting only the *latest* step's galaxies from the original
        field (get_residual_field uses self.res_deblend, which deblend_field
        overwrites per step — iterative_deblender.py:51,74 +
        field_deblender.py:59-60,380), so earlier finds reappear in later
        residuals.  False (default) preserves that behavior exactly; True
        subtracts every galaxy found so far, which is what the procedure
        scientifically intends.
        """
        field_image = self.field_image.copy()
        res_step = self.deblending_step(
            field_image,
            galaxy_distances_to_center=galaxy_distances_to_center,
            cutout_images=cutout_images,
            optimise_positions=optimise_positions,
            epistemic_criterion=epistemic_criterion,
            mse_criterion=mse_criterion,
        )
        res_deblend = res_step
        if res_step is None or res_step["list_idx"] is None:
            print("converged !")
            return self.res_deblend

        def residual():
            if cumulative_residual:
                return self.get_residual_field(res_deblend=res_deblend)
            return self.get_residual_field()

        new_residual_field = residual()
        self.mse.append(_mse(self.field_image, new_residual_field))
        shifts_previous: list = []
        k = 1

        while res_step["shifts"] is not None and len(res_step["shifts"]) > len(
            shifts_previous
        ):
            print(f"iteration {k}")
            shifts_previous = res_step["shifts"]
            prev_residual_field = new_residual_field

            res_step = self.deblending_step(
                prev_residual_field,
                optimise_positions=optimise_positions,
                epistemic_criterion=epistemic_criterion,
                mse_criterion=mse_criterion,
            )

            if res_step is None or res_step["list_idx"] is None:
                new_residual_field = residual()
                self.mse.append(_mse(prev_residual_field, new_residual_field))
                break

            res_deblend = np.concatenate([res_deblend, res_step])
            new_residual_field = residual()
            self.mse.append(_mse(prev_residual_field, new_residual_field))
            k += 1
            print(
                f"{sum(self.nb_of_deblended_galaxies)} galaxies found up to this step."
            )

        print("converged !")
        self.res_deblend = res_deblend
        return self.res_deblend

    def iterative_deblend_and_render(
        self,
        galaxy_distances_to_center=None,
        optimise_positions: bool = False,
        epistemic_criterion: float = 100.0,
        mse_criterion: float = 100.0,
        measure: bool = False,
        det_cfg=None,
        max_iterations: int = 20,
        transfer_dtype=None,
    ):
        """Survey-scale iterative detect-subtract-repeat, device-resident.

        The classic ``iterative_deblending`` honors the reference recarray
        contract, so every step downloads all stamp maps and re-uploads the
        residual for the next detection.  Here the running residual never
        leaves the device: each step detects on the device residual (tiled
        COO detection for large fields), streams the new sources through
        the chunked deblend+render core (_stream_deblend), and subtracts
        the rendered model in place.  Only per-source catalog scalars and
        the final residual cross the host link.

        Semantics follow the *cumulative-residual* mode (every source found
        so far stays subtracted — the scientifically intended procedure;
        the reference's latest-step-only quirk requires re-rendering from
        stamps and is preserved in ``iterative_deblending``).  Termination
        matches the reference: loop while a step finds strictly more
        sources than the previous one (iterative_deblender.py:58), stop on
        zero detections/deblends, plus a ``max_iterations`` safety bound.

        Returns (catalog_recarray, residual_field); the catalog gains an
        ``iteration`` column (0-based step index).  ``transfer_dtype``
        ('bfloat16'/'float16') downloads the final residual at reduced
        precision, as in ``deblend_and_render``.
        """
        import jax.numpy as jnp
        import pandas as pd

        from debvader_tpu.pipeline.field import _check_reduced_dtype
        from debvader_tpu.pipeline.tiles import detect_objects_tiled

        transfer_dtype = _check_reduced_dtype("transfer_dtype", transfer_dtype)
        field_dev = self._device_field(self.field_image)
        residual_dev = field_dev
        all_cols: dict[str, list] = {}
        n_prev = 0
        total = 0

        for k in range(max_iterations):
            if k == 0 and galaxy_distances_to_center is not None:
                centers = np.asarray(galaxy_distances_to_center)
            else:
                centers = detect_objects_tiled(
                    residual_dev,
                    det_cfg,
                    tile=self.cfg.tile_size,
                    overlap=self.cfg.tile_overlap,
                    mesh=self.mesh,
                )
            if len(centers) == 0:
                print("No more galaxies found")
                break

            cols, canvases, n_new = self._stream_deblend(
                residual_dev,
                centers,
                optimise_positions=optimise_positions,
                epistemic_criterion=epistemic_criterion,
                mse_criterion=mse_criterion,
                measure=measure,
                # Beside the chunk workspace the device holds the memoized
                # original field (the _device_field cache stays alive for
                # the whole run), the running residual, and the padded
                # canvas — 3 full-field buffers, not the one-shot path's 2.
                resident_fields=3,
            )
            if n_new == 0:
                print("No more galaxies found")
                break

            from debvader_tpu.ops.shift import render_pad
            from debvader_tpu.pipeline.field import (
                _model_subtract,
                _model_subtract_donated,
            )

            pad = render_pad(self.cutout_size, self.cfg.interp_order)
            # k == 0: residual_dev aliases the memoized _device_field cache,
            # which must survive for later runs — donate only the canvas.
            # k > 0: this step owns the residual exclusively; donating it
            # drops a full-field buffer from the subtract's peak.
            sub = _model_subtract if k == 0 else _model_subtract_donated
            residual_dev, step_mse = sub(
                residual_dev, canvases["mean"], pad=pad
            )
            self.mse.append(float(step_mse))

            cols["list_idx"] = [i + total for i in cols["list_idx"]]
            cols["iteration"] = [k] * n_new
            for key, vals in cols.items():
                all_cols.setdefault(key, []).extend(vals)
            total += n_new
            print(f"iteration {k + 1}")
            print(f"{total} galaxies found up to this step.")

            if k > 0 and n_new <= n_prev:
                break
            n_prev = n_new

        print("converged !")
        if total == 0:
            return None, self.field_image.copy()
        catalog = pd.DataFrame(all_cols).to_records(index=False)
        residual_field = self.field_image.copy()
        out_dev = residual_dev[0]
        if transfer_dtype is not None:
            out_dev = out_dev.astype(jnp.dtype(transfer_dtype))
        residual_field[0] = np.asarray(out_dev, self.field_image.dtype)
        self.res_deblend = catalog
        return catalog, residual_field

    def deblending_step(
        self,
        field_image,
        galaxy_distances_to_center=None,
        cutout_images=None,
        optimise_positions: bool = False,
        epistemic_criterion: float = 100.0,
        mse_criterion: float = 100.0,
    ):
        """One detect+deblend pass (iterative_deblender.py:101-152)."""
        if galaxy_distances_to_center is None:
            detection_k = detect_objects(field_image)
        else:
            detection_k = np.asarray(galaxy_distances_to_center)

        if len(detection_k) == 0:
            print("No more galaxies found")
            return self.res_deblend

        res_step = self.deblend_field(
            field_image=field_image,
            galaxy_distances_to_center=detection_k,
            cutout_images=cutout_images,
            optimise_positions=optimise_positions,
            epistemic_criterion=epistemic_criterion,
            mse_criterion=mse_criterion,
        )

        if res_step["list_idx"] is None or len(res_step["list_idx"]) == 0:
            print("No more galaxies found")
            return self.res_deblend

        # Offset list_idx by the galaxies found in earlier steps
        # (iterative_deblender.py:145-147).
        offset = sum(self.nb_of_deblended_galaxies) - self.nb_of_deblended_galaxies[-1]
        if offset:
            res_step["list_idx"] += offset

        print(f"Deblend {self.nb_of_deblended_galaxies[-1]} more galaxy(ies)")
        return res_step
