"""Multi-pass bf16-limb MXU precision schemes, per layer.

The TPU MXU multiplies in bfloat16 (fp32 accumulation).  XLA exposes three
pass counts for float32 operands via ``jax.lax.Precision``:

    DEFAULT  1 pass   inputs rounded to bf16      ~6.7e-3 flux err (r3 ladder)
    HIGH     3 passes 2-limb split, drops lo*lo   ~1.85e-4
    HIGHEST  6 passes 3-limb split                ~1.1e-6

The <=1e-4 fidelity clause (BASELINE.json north_star) sits in the wide gap
between HIGH and HIGHEST, and XLA offers nothing in between — this module
does.  A float32 input splits exactly into three bf16 limbs (24 = 3 x 8
mantissa bits; each round-to-nearest limb cancels >=9 leading bits, so the
third limb is exact): x = xh + xm + xl with |xm| ~ 2^-9 |x|, |xl| ~ 2^-18 |x|.
A scheme is a set of limb-pair products to accumulate; each product is one
bf16 x bf16 -> fp32 MXU contraction (exact into the fp32 accumulator).

Two things make custom schemes worth building:

1. **Intermediate error rungs.**  ``bf16x5`` ({hh,hm,mh,hl,lh}, dropping
   only mm) costs 5/6 of HIGHEST for ~5x less error than HIGH; ``bf16x4``
   (2-limb exact) costs 4/6 for ~2.5x less.
2. **Lane packing.**  The systolic array is 128 lanes wide on the output-
   channel axis: a conv with C_out <= 42 wastes >2/3 of every pass.  For a
   fixed x-limb, the needed w-limbs concatenate along the *output-channel*
   axis — one conv computes {xi*wh, xi*wm, xi*wl} as channel blocks in a
   single pass while total lanes stay <= 128.  The deblender's decoder tail
   (C_out 32/12) therefore gets the *exact* 9-term product for 3 one-pass
   costs, where native HIGHEST pays 6.  Grouping terms by x-limb implements
   this: cost(scheme) ~= number of distinct x-limbs x ceil(packed_lanes/128).

The same term-set machinery doubles as a **CPU emulator of TPU arithmetic**:
explicit bf16-limb contractions computed on the CPU backend reproduce the
MXU's pass structure bit-for-bit up to fp32 summation order, so per-layer
precision placements can be error-searched on host without touching the
chip (scripts/search_precision_placement.py) — the native rungs map to
``bf16x1``/``bf16x3``/``bf16x6`` via ``EMULATION``.

Reference anchor: the fidelity target is the true-fp32 Keras forward at
/root/reference/src/debvader/model/model.py:164-218; debvader itself has no
precision machinery (TF fp32 throughout).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "SCHEMES",
    "EMULATION",
    "split_limbs",
    "apply_scheme",
    "MPConv",
    "MPDense",
    "MPConvTranspose2DTF",
    "resolve",
]

# scheme -> (number of limbs, ((x_limb, w_limb), ...), split_mode);
# limb 0 = high.  split_mode 'rne' = round-to-nearest (reduce_precision);
# 'rtz' = truncate toward zero — what XLA's own bf16_3x decomposition uses:
# measured on hardware, native HIGH's output matches the RTZ 2-limb 3-term
# emulation to ~its own epsilon and is ~3x LESS accurate than the RNE split
# at the same pass count (single-matmul probe, BASELINE.md r4).  Term sets
# are ordered so the largest-magnitude product accumulates first.
SCHEMES: dict[str, tuple[int, tuple[tuple[int, int], ...], str]] = {
    # native-equivalents (used for CPU emulation of the XLA rungs)
    "bf16x1": (1, ((0, 0),), "rne"),
    "bf16x3t": (2, ((0, 0), (0, 1), (1, 0)), "rtz"),
    # 2-pass probes (r5 roofline lemma, scripts/probe_two_pass_floor.py):
    # dropping either first-order cross term leaves ~half of DEFAULT's
    # 2^-9-grade error — measured >=1e-3 model-level with or without flux
    # calibration, so no 2-pass scheme can meet the <=1e-4 clause and
    # 3 passes/layer is the arithmetic floor (docs/ROOFLINE.md)
    "bf16x2": (2, ((0, 0), (1, 0)), "rne"),
    "bf16x2t": (2, ((0, 0), (1, 0)), "rtz"),
    # RNE rungs — better error per pass than the native ladder
    "bf16x3": (2, ((0, 0), (0, 1), (1, 0)), "rne"),
    "bf16x4": (2, ((0, 0), (0, 1), (1, 0), (1, 1)), "rne"),
    "bf16x5": (3, ((0, 0), (0, 1), (1, 0), (0, 2), (2, 0)), "rne"),
    "bf16x6": (3, ((0, 0), (0, 1), (1, 0), (1, 1), (0, 2), (2, 0)), "rne"),
    # exact product of the 3-limb (= full fp32) representation
    "bf16x9": (
        3,
        (
            (0, 0), (0, 1), (1, 0), (1, 1), (0, 2), (2, 0),
            (1, 2), (2, 1), (2, 2),
        ),
        "rne",
    ),
}

# How the XLA-native rungs are reproduced with explicit limbs (CPU emulation
# of TPU arithmetic).  None = Precision.DEFAULT (one RNE-rounded pass —
# matches the native output bit-for-bit on hardware).  'high' is the RTZ
# decomposition above.  'highest' is indistinguishable from the RNE 6-term
# at its own ~1e-6 error level (probe), so the RNE set stands in.
EMULATION: dict[str | None, str] = {
    None: "bf16x1",
    "default": "bf16x1",
    "high": "bf16x3t",
    "highest": "bf16x6",
}

NATIVE_RUNGS = ("default", "high", "highest")


def _round_bf16(x: jax.Array, mode: str) -> jax.Array:
    """bf16-representable value of x, in float32, without an astype
    round-trip: XLA TPU runs with excess precision allowed, so a
    ``convert(convert(x, bf16), f32)`` pair can be folded away, which would
    silently collapse a limb split to (x, 0, ...) — bf16x1 arithmetic with
    extra zero-limb passes (observed on hardware).  'rne' uses
    ``lax.reduce_precision`` (guaranteed not elided); 'rtz' masks the low
    16 mantissa bits (bitcast ops are likewise opaque to convert folding).
    """
    if mode == "rne":
        return jax.lax.reduce_precision(x, exponent_bits=8, mantissa_bits=7)
    i = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jax.lax.bitcast_convert_type(
        jnp.bitwise_and(i, jnp.int32(-65536)), jnp.float32
    )


def split_limbs(x: jax.Array, n: int, mode: str = "rne") -> list[jax.Array]:
    """Split a float32 array into ``n`` bf16 limbs.

    Sum of limbs (in float32) reconstructs x exactly for n >= 3; for n < 3
    the last limb absorbs the remainder of the truncation.
    """
    limbs = []
    r = x
    for _ in range(n - 1):
        h = _round_bf16(r, mode)
        limbs.append(h.astype(jnp.bfloat16))
        r = r - h
    limbs.append(r.astype(jnp.bfloat16))
    return limbs


def apply_scheme(
    x: jax.Array,
    w: jax.Array,
    scheme: str,
    w_out_axis: int,
    contract: Callable[[jax.Array, jax.Array], jax.Array],
) -> jax.Array:
    """Accumulate the scheme's limb products: sum_{(i,j)} contract(x_i, w_j).

    ``contract`` must map bf16 operands to a float32 result whose LAST axis
    is the output-channel axis, linear in both operands.  For each distinct
    x-limb the needed w-limbs are concatenated along ``w_out_axis`` so they
    ride one contraction's lanes (the lane-packing trick above); the result
    splits back into blocks along the last axis and sums in float32.
    """
    nlimbs, terms, mode = SCHEMES[scheme]
    xl = split_limbs(x.astype(jnp.float32), nlimbs, mode)
    wl = split_limbs(w.astype(jnp.float32), nlimbs, mode)
    groups: dict[int, list[int]] = {}
    for i, j in terms:
        groups.setdefault(i, []).append(j)
    out = None
    for i in sorted(groups):
        js = groups[i]
        if len(js) == 1:
            y = contract(xl[i], wl[js[0]])
        else:
            wcat = jnp.concatenate([wl[j] for j in js], axis=w_out_axis)
            y = contract(xl[i], wcat)
            nout = y.shape[-1] // len(js)
            y = y.reshape(y.shape[:-1] + (len(js), nout)).sum(axis=-2)
        out = y if out is None else out + y
    return out


def resolve(
    cfg, key: str
) -> tuple[jax.lax.Precision | None, str | None]:
    """(native lax precision, explicit scheme) for layer ``key`` under cfg.

    Exactly one of the two is meaningful: scheme=None means "use the native
    precision arg on a stock module"; otherwise instantiate the MP* module
    with the returned scheme.  Honors ``cfg.layer_precision`` overrides,
    falls back to ``cfg.matmul_precision``, and maps native rungs to their
    explicit-limb equivalents when ``cfg.limb_emulation`` is set.
    """
    rung = cfg.layer_rung(key)
    if rung is None or rung in NATIVE_RUNGS:
        effective = rung if rung is not None else cfg.matmul_precision
        if cfg.limb_emulation:
            return None, EMULATION[effective]
        if effective is None:
            return None, None
        return jax.lax.Precision(effective), None
    return None, rung


class MPConv(nn.Module):
    """Forward NHWC conv under an explicit limb scheme.

    Parameter tree (HWIO ``kernel`` + ``bias``) matches ``flax.linen.Conv``,
    so instantiating with the same ``name`` keeps checkpoints interchangeable
    across precision configurations.
    """

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    scheme: str = "bf16x4"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, cin, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )

        def contract(xb, wb):
            return jax.lax.conv_general_dilated(
                xb,
                wb,
                window_strides=self.strides,
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )

        y = apply_scheme(x, kernel, self.scheme, w_out_axis=3, contract=contract)
        return y + bias


class MPDense(nn.Module):
    """Dense layer under an explicit limb scheme (param tree == nn.Dense)."""

    features: int
    scheme: str = "bf16x4"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (cin, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )

        def contract(xb, wb):
            return jax.lax.dot_general(
                xb,
                wb,
                (((xb.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        y = apply_scheme(x, kernel, self.scheme, w_out_axis=1, contract=contract)
        return y + bias


class MPConvTranspose2DTF(nn.Module):
    """TF-semantics transposed conv under an explicit limb scheme.

    Kernel stays in the TF (kh, kw, out, in) layout of
    :class:`debvader_tpu.models.layers.ConvTranspose2DTF` (same param tree,
    same ``transpose_kernel=True`` computation), with limb concat along the
    out-channel axis (2).
    """

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    use_bias: bool = True
    scheme: str = "bf16x4"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.glorot_uniform(in_axis=3, out_axis=2),
            (kh, kw, self.features, in_ch),
            jnp.float32,
        )

        def contract(xb, wb):
            return jax.lax.conv_transpose(
                xb,
                wb,
                strides=self.strides,
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                transpose_kernel=True,
                preferred_element_type=jnp.float32,
            )

        y = apply_scheme(x, kernel, self.scheme, w_out_axis=2, contract=contract)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias
        return y
