"""Normalization helpers matching the reference ALP numerics."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def clamped_norm(x: jax.Array, axis: int = -1, eps: float = 1e-4,
                 keepdims: bool = False) -> jax.Array:
    """max(||x||_2, eps), computed as sqrt(max(sum x², eps²)).

    Forward-identical to the reference clamp, but with a well-defined zero
    gradient at x == 0 (jnp.linalg.norm's gradient is NaN there, which an
    all-background support mask would propagate into training).
    """
    n2 = jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(n2, eps * eps))


def safe_l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-4) -> jax.Array:
    """L2-normalize with the reference's epsilon clamp.

    Matches ``safe_norm`` (reference models/alpmodule.py:14-18):
    ``x / max(||x||_2, eps)`` — note the clamp is on the *norm*, not norm+eps.
    """
    return x / clamped_norm(x, axis=axis, eps=eps, keepdims=True)


def cosine_similarity(x: jax.Array, y: jax.Array, axis: int = -1,
                      eps: float = 1e-4) -> jax.Array:
    """``F.cosine_similarity`` semantics: ``x·y / (max(||x||,eps)·max(||y||,eps))``.

    Used by ALP 'mask' (global-prototype) scoring
    (reference models/alpmodule.py:59).
    """
    dot = jnp.sum(x * y, axis=axis)
    return dot / (clamped_norm(x, axis=axis) * clamped_norm(y, axis=axis))


# ---------------------------------------------------------------------------
# Pallas token LayerNorm (TPU layout pin)
# ---------------------------------------------------------------------------
#
# Exists for LAYOUT, not speed.  XLA's TPU layout assignment avoids
# lane-reductions, so a transformer block whose LayerNorms reduce over the
# minor-most axis gets its whole residual stream flipped to a transposed
# {1,2,0} layout — which makes every matmul that WRITES the stream (the
# fc2 / proj outputs) emit transposed MXU results at roughly half rate
# (r2 device trace: SAM-H fc2 5.1 ms/layer vs 2.2 standalone; removing
# the LNs flips the scan carry back to {2,1,0}).  A Pallas custom call
# constrains its operands/results to the natural layout, so running the
# LNs in-kernel pins the stream natural and the matmuls run at peak.
# Math mirrors flax nn.LayerNorm exactly: f32 stats (fast variance,
# clipped at 0), mul = rsqrt(var+eps) * scale, y = (x-mean)*mul + bias,
# cast to dtype (flax/linen/normalization.py _compute_stats/_normalize).

import functools

from jax import lax

try:  # pallas is TPU-path only; keep module importable anywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pl = None


def _ln_rows(n: int) -> int | None:
    for r in (256, 128, 64, 32, 16, 8):
        if n % r == 0:
            return r
    return None


def _ln_math(x2, scale, bias, eps):
    """Flax-identical XLA LayerNorm over the last axis ((N, C) input)."""
    xf = x2.astype(jnp.float32)
    m = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - m * m, 0.0)
    mul = lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    return (xf - m) * mul + bias.astype(jnp.float32)


def _ln_kernel(x_ref, s_ref, b_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)                      # (rows, C)
    m = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=1, keepdims=True) - m * m, 0.0)
    mul = lax.rsqrt(var + eps) * s_ref[...].astype(jnp.float32)
    y = (x - m) * mul + b_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "out_dtype",
                                             "interpret"))
def _ln_pallas(x2, scale, bias, eps, out_dtype, interpret=False):
    n, c = x2.shape
    rows = _ln_rows(n)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        interpret=interpret,
        grid=(n // rows,),
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), out_dtype),
    )(x2, scale.reshape(1, c), bias.reshape(1, c))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _ln_tpu(x2, scale, bias, eps, out_dtype, interpret=False):
    return _ln_pallas(x2, scale, bias, eps, out_dtype, interpret)


def _ln_tpu_fwd(x2, scale, bias, eps, out_dtype, interpret=False):
    return (_ln_tpu(x2, scale, bias, eps, out_dtype, interpret),
            (x2, scale, bias))


def _ln_tpu_bwd(eps, out_dtype, interpret, res, g):
    x2, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, s, b: _ln_math(x, s, b, eps).astype(out_dtype),
        x2, scale, bias)
    return vjp(g)


_ln_tpu.defvjp(_ln_tpu_fwd, _ln_tpu_bwd)


def layer_norm_tokens(x: jax.Array, scale: jax.Array, bias: jax.Array,
                      epsilon: float = 1e-6,
                      out_dtype=None) -> jax.Array:
    """LayerNorm over the last axis of (..., C), Pallas-backed on TPU.

    Numerics are flax nn.LayerNorm's (f32 fast-variance stats).  Platform
    selection happens at LOWERING time (lax.platform_dependent, like the
    attention kernels): CPU lowerings — including models traced under a
    ``jax.default_device(cpu)`` init — take the plain XLA math, as do
    shapes without an 8-multiple row divisor.  See the module comment
    for why this exists (layout pin).
    """
    import os

    out_dtype = jnp.dtype(out_dtype or x.dtype)
    c = x.shape[-1]
    n = 1
    for d in x.shape[:-1]:
        n *= d
    x2 = x.reshape(n, c)

    def math_path(x2, scale, bias):
        return _ln_math(x2, scale, bias, epsilon).astype(out_dtype)

    if (pl is None or _ln_rows(n) is None
            or os.environ.get("PTPU_LN_PALLAS", "1") == "0"):
        return math_path(x2, scale, bias).reshape(x.shape)

    def kernel_path(x2, scale, bias):
        # interpret when the default backend is not a TPU: only reachable
        # there when something forces the kernel branch (tests monkeypatch
        # platform_dependent to drive the pallas wiring on CPU)
        interpret = jax.default_backend() not in ("tpu", "axon")
        return _ln_tpu(x2, scale, bias, epsilon, out_dtype, interpret)

    out = jax.lax.platform_dependent(x2, scale, bias, cpu=math_path,
                                     default=kernel_path)
    return out.reshape(x.shape)
