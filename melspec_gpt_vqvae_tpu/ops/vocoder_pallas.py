"""Fused MelGAN resblock-stack Pallas kernel (all four stage widths).

Each MelGAN upsample stage runs ``n_residual_layers=3`` dilated ResnetBlocks
(reference ``/root/reference/vocoder/modules.py:23-36``, dilations ``3**j``).
XLA schedules the 9 convs of a stage as separate HBM round trips; at serving
batch all four stages are equal-sized ~1.8 GB activation tensors (per B=128
chunk) and bandwidth-bound: ~18 full-tensor passes per stage against a
compute floor of a few tens of ms (BENCH_NOTES.md "conv-stage split").

This kernel keeps a time-tile of the activation resident in VMEM and runs
the stage's whole resblock stack on it: one HBM read + one HBM write per
stage instead of ~18 passes.  The dilated 3-tap convs become one MXU matmul
per block over a roll-concatenated tile; the 1x1 convs and shortcuts are
plain matmuls; the LeakyReLUs and residual adds stay in registers.  Weights
for all blocks of a stage live in VMEM for the whole kernel (<2 MB).  The
input tile DMA is double-buffered (tile i+1 streams in while tile i
computes) so the HBM read overlaps the MXU work.

Lane folding (C < 128): Mosaic DMA needs 128-lane-aligned HBM slices, and
C=64/32 tiles would waste most of the systolic array.  ``(B, T, C)`` is
reshaped to ``(B, T/f, f*C)`` with ``f = 128//C`` — f *consecutive* time
steps per row, a pure row-major reshape.  A time shift by dilation ``d``
becomes, per phase ``p``: row shift ``(p±d)//f`` and phase ``(p±d)%f`` —
so each block's tap matmul reads a concat of a few row-rolls of the folded
tile against a host-packed scatter matrix ``W3[(s,p',ci) -> (p,co)]``
(:func:`pack_stack`), and the 1x1 convs become block-diagonal ``f*C`` mats.
The zero blocks waste MXU FLOPs (f x) but the stage is bandwidth-bound.

Boundary semantics: the kernel reads *clamped* windows of the unpadded
activation — no reflect-pad pass — so its first/last :func:`edge_width`
output samples are garbage (the reference reflect-pads each block's input,
``vocoder/modules.py:30``).  ``FusedConvs`` (models/quantized.py) recomputes
exactly those edge rows with the unfused path on tiny slabs and patches them
in, which makes the executor match ``FloatConvs`` everywhere
(tests/test_vocoder_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 16   # folded rows; >= every roll-set span below, sublane-aligned
LANES = 128


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def fold_factor(c: int) -> int:
    """Time-steps packed per folded row (1 when C is already >=128)."""
    return max(1, LANES // c)


def roll_sets(dilations, f: int):
    """Per-block sorted row-roll sets: the folded-row offsets
    ``(p + k*d) // f`` a dilated 3-tap conv needs, over phases p and taps
    k in {-1, 0, +1}."""
    sets = []
    for d in dilations:
        s = {0}
        for p in range(f):
            s.add((p + d) // f)
            s.add((p - d) // f)
        sets.append(tuple(sorted(s)))
    return tuple(sets)


def edge_width(dilations, f: int) -> int:
    """Garbage samples at each sequence end of the fused output: the
    per-block max |roll| accumulates through the stack, in time units."""
    return f * sum(max(abs(s) for s in ss) for ss in roll_sets(dilations, f))


def pick_tile(t: int, c: int, halo: int, itemsize: int = 2,
              budget_bytes: int = 7 << 20, dilations=(1, 3, 9)) -> int | None:
    """Largest folded-row tile that divides ``t_f = t // f``, is
    sublane-aligned, leaves at least two tiles (the kernel's clamped edge
    windows need ``tile + 2*halo <= t_f``), and keeps the kernel's peak
    VMEM footprint under ``budget_bytes``.  None if no usable tile exists
    (caller falls back to the unfused path)."""
    f = fold_factor(c)
    cf = f * c
    tf = t // f
    parts = max(len(s) for s in roll_sets(dilations, f))
    per_row = (12 + 2 * parts) * cf * max(1, itemsize // 2)
    max_rows = budget_bytes // per_row - 2 * halo
    best = None
    for d in range(16, min(tf, max_rows) + 1, 16):
        if tf % d == 0 and 2 * d <= tf and d + 2 * halo <= tf:
            best = d
    return best


def pack_stack(params_list, dtype, dilations=(1, 3, 9)) -> tuple:
    """Scatter the per-resblock flax param subtrees
    ({block_conv1:{kernel (3,C,C), bias}, block_conv2:{kernel (1,C,C),
    bias}, shortcut:{kernel (1,C,C), bias}}) into the kernel's folded
    layout: per block, a tap matrix ``w3 (len(S)*cf, cf)`` whose
    (s, p', ci) -> (p, co) blocks hold kernel tap k where
    ``p + k*d = f*s + p'``, block-diagonal ``w1/ws (cf, cf)``, and
    phase-tiled biases ``(1, cf)``.  Traceable (static-slice updates), so
    it can run under jit on weight tracers.  Returns a flat tuple of
    6 arrays per block, kernel operand order."""
    c = params_list[0]["block_conv2"]["kernel"].shape[-1]
    f = fold_factor(c)
    cf = f * c
    sets = roll_sets(dilations, f)
    eye = jnp.eye(f, dtype=dtype)
    out = []
    for p, d, ss in zip(params_list, dilations, sets):
        k3 = jnp.asarray(p["block_conv1"]["kernel"], dtype)   # (3, c, c)
        w3 = jnp.zeros((len(ss) * cf, cf), dtype)
        for ph in range(f):
            for k, kd in ((0, -d), (1, 0), (2, d)):
                tt = ph + kd
                si = ss.index(tt // f)
                row = si * cf + (tt % f) * c
                w3 = w3.at[row:row + c, ph * c:(ph + 1) * c].set(k3[k])
        tile_b = lambda a: jnp.tile(jnp.asarray(a, dtype), f).reshape(1, cf)
        bd = lambda a: jnp.kron(eye, jnp.asarray(a, dtype).reshape(c, c))
        out += [w3, tile_b(p["block_conv1"]["bias"]),
                bd(p["block_conv2"]["kernel"]),
                tile_b(p["block_conv2"]["bias"]),
                bd(p["shortcut"]["kernel"]),
                tile_b(p["shortcut"]["bias"])]
    return tuple(out)


def _leaky(v):
    # nn.leaky_relu(v, 0.2) == max(v, 0.2 v) for slope < 1
    return jnp.maximum(v, 0.2 * v)


def _stack_kernel(x_hbm, *refs, sets, t_tile, halo, n_t, t_total):
    w = refs[:6 * len(sets)]
    out_ref = refs[6 * len(sets)]
    xbuf, sem = refs[6 * len(sets) + 1:]
    i = pl.program_id(0)
    rows = t_tile + 2 * halo

    def dma(step, slot):
        # Clamped window: tile 0 starts at row 0 (not -halo), the last
        # tile ends at t_total (not t_total+halo) — edge tiles read a
        # shifted window of real data instead of reflect-padding, and the
        # store below compensates with a matching static offset.  Every
        # operand is a multiple of halo=16, but Mosaic's divisibility
        # analysis does not see through clip — annotate.
        b = step // n_t
        t = step % n_t
        s = pl.multiple_of(
            jnp.clip(t * t_tile - halo, 0, t_total - rows), halo)
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(s, rows), :], xbuf.at[slot], sem.at[slot])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        dma(i + 1, (i + 1) % 2).start()

    dma(i, i % 2).wait()
    x = xbuf[i % 2]                               # (rows, cf)
    dt = x.dtype
    # All buffers stay full-height: the tap shifts are circular rolls
    # (Mosaic cannot lane-concat slices with mismatched sublane offsets),
    # so each block's first/last max|roll| rows are garbage that
    # accumulates to edge_width/f <= 13 < halo rows per side — inside the
    # discarded halo (or, on the two edge tiles, inside the rows
    # FusedConvs repatches).
    for k, ss in enumerate(sets):
        w3, b3, w1, b1, ws, bs = w[6 * k:6 * k + 6]
        h = _leaky(x)
        # s == 0 must emit h directly: jnp.roll(h, 0) lowers to a
        # concat with a zero-row slice, which Mosaic rejects ("vector
        # types must have positive constant sizes") — and roll_sets
        # always contains 0.
        cat = jnp.concatenate(
            [h if s == 0 else jnp.roll(h, -s, 0) for s in ss], -1)
        m = jnp.dot(cat, w3[:], preferred_element_type=jnp.float32)
        m = _leaky((m + b3[:]).astype(dt))
        m = (jnp.dot(m, w1[:], preferred_element_type=jnp.float32)
             + b1[:]).astype(dt)
        s = (jnp.dot(x, ws[:], preferred_element_type=jnp.float32)
             + bs[:]).astype(dt)
        x = s + m
    # Store offset mirrors the clamped load: 0 / halo / 2*halo for the
    # first / interior / last tile (static sublane-aligned slices; n_t>=2
    # is guaranteed by pick_tile so exactly one branch runs per tile).
    t = i % n_t

    @pl.when(t == 0)
    def _():
        out_ref[0] = x[0:t_tile]

    @pl.when(jnp.logical_and(t > 0, t < n_t - 1))
    def _():
        out_ref[0] = x[halo:halo + t_tile]

    @pl.when(t == n_t - 1)
    def _():
        out_ref[0] = x[2 * halo:2 * halo + t_tile]


@functools.partial(jax.jit,
                   static_argnames=("sets", "t_tile", "interpret"))
def _fused_call(x, packed, sets, t_tile, interpret):
    b, tf, cf = x.shape
    halo = HALO
    n_t = tf // t_tile
    kernel = functools.partial(_stack_kernel, sets=sets, t_tile=t_tile,
                               halo=halo, n_t=n_t, t_total=tf)
    return pl.pallas_call(
        kernel,
        grid=(b * n_t,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(packed),
        out_specs=pl.BlockSpec((1, t_tile, cf),
                               lambda i: (i // n_t, i % n_t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tf, cf), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, t_tile + 2 * halo, cf), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x, *packed)


def fused_resblock_stack(x: jnp.ndarray, packed: tuple,
                         dilations=(1, 3, 9), *, t_tile: int | None = None,
                         interpret: bool | None = None) -> jnp.ndarray:
    """Run a MelGAN stage's full resblock stack fused.  x: (B, T, C),
    ``packed`` from :func:`pack_stack` on the same dilations.

    The first/last :func:`edge_width` output samples are garbage (see
    module docstring) — callers must patch them (``FusedConvs``) or
    discard them.  If no legal tile exists for (T, C) the caller should
    use the unfused path (``supports()`` tells it in advance)."""
    b, t, c = x.shape
    f = fold_factor(c)
    if t_tile is None:
        t_tile = pick_tile(t, c, HALO, x.dtype.itemsize, dilations=dilations)
    if t_tile is None or (t // f) % t_tile:
        raise ValueError(f"no legal tile for T={t} C={c} (got {t_tile})")
    if interpret is None:
        interpret = not _on_tpu()
    sets = roll_sets(dilations, f)
    xf = x.reshape(b, t // f, f * c)
    out = _fused_call(xf, packed, sets, t_tile, bool(interpret))
    return out.reshape(b, t, c)


def supports(t: int, c: int, dilations=(1, 3, 9),
             itemsize: int = 2) -> bool:
    """True when the fused kernel can run this stage geometry: C a
    multiple of 128 (Mosaic needs 128-lane-aligned HBM DMA slices) or a
    divisor of it (lane folding), T divisible by the fold, a legal tile,
    and the roll spans inside the halo."""
    f = fold_factor(c)
    if c % LANES and LANES % c:
        return False
    if t % f or t // f <= HALO:
        return False
    if any(max(abs(s) for s in ss) > HALO for ss in roll_sets(dilations, f)):
        return False
    return pick_tile(t, c, HALO, itemsize, dilations=dilations) is not None
