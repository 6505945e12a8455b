"""Pallas TPU probe: VMEM-resident + streamed fast-stack mega-kernel.

THE round-4 experiment (VERDICT r3, next-round item 1): the single-stream
decode is bound by the fast stack re-reading its weights once per codebook
step — 10x per frame — at small-op bandwidth (~316 GB/s; the XLA trace
shows 6.4 ms of the 14 ms frame). The one regime XLA cannot express is
keeping weights ON-CHIP across the 10 steps: VMEM contents do not persist
between XLA ops, but a single Pallas kernel that runs the WHOLE 10-step
fast-AR loop can hold R layers resident in VMEM (loaded once per frame)
and stream the remaining S = 12-R layers with double-buffered DMA.

First, the corrected arithmetic (the round-3 README understated the stack
size, and VERDICT r3 repeated it): the fast stack is 12 layers x 34.6 M
params (qkv 3.9 M + wo 2.4 M + FFN 28.3 M at dim 1536 / inter 6144)
= 415 M params -> **415 MB int8, 208 MB int4**. NEITHER fits the 128 MB
VMEM whole; full residency is impossible. What a kernel can do:

  * stream S layers per step as large contiguous DMAs (3.9-9.4 MB pieces)
    instead of XLA's per-op transfers -> closer to peak HBM bw;
  * hold R layers resident: kills R x 34.6 MB x 9 of the 4.15 GB/frame;
  * per-frame traffic = (R + 10 S) x 34.6 MB + activations.

Probe geometry (flagship fast stack, B=1):
  x (1,1536) -> [per layer: qkv matvec (1536->2560), mock-attn mix,
  wo (1536->1536), rms, w13 (1536->12288), silu*gate, w2 (6144->1536)]
  x 12 layers x 10 steps. Attention/sampling/embeddings are OMITTED here
  (the probe answers the bandwidth question; their cost is measured on
  the XLA side at ~2.4 ms/frame and carries over).

Two matmul variants:
  * "bf16": weight-only int8 — dequantize per column-chunk to bf16 on the
    VPU feeding the MXU (the XLA path's numerics);
  * "w8a8": dynamic per-call activation int8 — int8 x int8 on the MXU,
    scales folded afterwards (approximate numerics; probe only, to see
    whether the VPU dequant is the binding engine).

MEASURED (v5e, 2026-08-18, this file's __main__; ms/frame = 10 steps,
matvec chain only — attention/sampling/embeddings would ADD time):

  | config                  | ms/frame | effective GB/s |
  |-------------------------|----------|----------------|
  | XLA production path     |   6.4    |  648           |
  | R=0 bf16                |   6.49   |  640           |
  | R=0 w8a8 (int8 MXU)     |   6.41   |  648           |
  | R=0 bf16 whole-layer DMA|   6.42   |  647           |
  | R=1 bf16                |   6.05   |  635           |
  | R=1 bf16 whole-layer DMA|   6.10   |  629           |
  | R=2 bf16 (VMEM max)     |   5.80   |  609           |
  | R=2 w8a8                |   5.82   |  606           |

VERDICT — measured negative, kept as the proof (VERDICT r3 item 1):
  1. ~650 GB/s is the chip's PRACTICAL HBM ceiling for this access
     pattern: in-kernel double-buffered DMA at 3.9-34.6 MB granularity,
     int8-MXU (zero dequant VPU work), and XLA's own scheduling all land
     within 1% of each other. The round-3 "316 GB/s small-op bandwidth"
     was a per-op number; XLA's OVERLAPPED fast stack already ran at
     648 GB/s effective, so there was never a 2x streaming win available.
  2. Residency saves exactly its arithmetic (34.6 MB x 9 / ~640 GB/s
     = 0.45 ms/layer) but VMEM caps R at 2 int8 layers alongside the
     stream buffers: best case 5.80 ms vs 6.4 — a <=4% end-to-end win
     BEFORE re-adding attention + sampling to the kernel, which would
     consume most of it. Not worth a numerics-carrying mega-kernel.
  3. int4 residency doubles R but the nibble unpack is VPU-serial
     (~5 ops/element; the int4 path already measured 2x slower in
     `pallas_int4.py`) — it trades a DMA win for a bigger VPU loss.
  4. ABSOLUTE ceiling at measured bandwidth: the whole frame moves
     7.8 GB int8 (slow 3.64 + fast 0.415 x 10); with maximal residency
     (~69 MB x 9 saved) that is 7.2 GB / 650 GB/s = 11.1 ms = 90 f/s
     = 4.2x realtime for a ZERO-compute perfect kernel. The BASELINE
     10x single-stream target (215 f/s) needs 1.7 TB/s effective —
     beyond the v5e's 819 GB/s spec sheet, i.e. PHYSICALLY unreachable
     for this 4.97B dual-AR architecture on one chip. 10x-per-chip is
     met as a serving number (66-68x at 32 streams, bench.py).

The probe is kept runnable for re-measurement on future hardware
(`python -m fish_speech_tpu.ops.pallas_faststack [R...] [bf16|w8a8] [big]`);
it is NOT wired into the production decode path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DF = 1536
DQKV = 2560  # 12*128 q + 2*4*128 kv
INTER = 6144
NL = 12
STEPS = 10

# streamed piece geometry: kind -> (piece_rows, piece_cols, pieces_per_layer)
def _kinds(big_pieces: bool):
    if big_pieces:
        # whole-weight pieces: max DMA size (w13 18.9 MB) for peak bw;
        # buffers cost 2x34.6 MB so only R <= 1 fits alongside
        return {
            "qkv": (DF, DQKV, 1),
            "wo": (DF, DF, 1),
            "w13": (DF, 2 * INTER, 1),
            "w2": (INTER, DF, 1),
        }
    return {
        "qkv": (DF, DQKV, 1),
        "wo": (DF, DF, 1),
        "w13": (DF, INTER, 2),  # (DF, 2*INTER) split along columns
        "w2": (INTER // 2, DF, 2),  # (INTER, DF) split along rows
    }


_ORDER = ("qkv", "wo", "w13", "w2")


def _rms(x, eps=1e-5):
    return x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)


def _dot_bf16(x, wq, scales_cols):
    w = wq.astype(jnp.bfloat16)
    y = jax.lax.dot_general(
        x.astype(jnp.bfloat16), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y * scales_cols


def _dot_w8a8(x, wq, scales_cols, xs):
    y = jax.lax.dot_general(
        x, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return y.astype(jnp.float32) * (xs * scales_cols)


def make_probe(r_resident: int, variant: str = "bf16",
               o_chunk: int = 2048, interpret: bool = False,
               big_pieces: bool = False):
    """Build the jitted probe fn over (x (1, DF) f32, weights pytree)."""
    R, S = r_resident, NL - r_resident
    assert 0 <= R < NL
    _KINDS = _kinds(big_pieces)

    def kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        res = {k: next(it) for k in _ORDER} if R else None
        sc = {k: next(it) for k in _ORDER}
        hbm = {k: next(it) for k in _ORDER}
        o_ref = next(it)
        buf = {k: next(it) for k in _ORDER}
        sem = {k: next(it) for k in _ORDER}

        total = {k: STEPS * S * _KINDS[k][2] for k in _ORDER}

        def dma(kind, t):
            """Async copy for this kind's piece-sequence item t (traced)."""
            rows, cols, pieces = _KINDS[kind]
            j = jax.lax.rem(t // pieces, jnp.int32(S))
            slot = jax.lax.rem(t, jnp.int32(2))
            if pieces == 1:
                src = hbm[kind].at[j]
            else:
                piece = jax.lax.rem(t, jnp.int32(pieces))
                if kind == "w13":
                    # streamed w13 is stored PRE-SPLIT (S, 2, DF, INTER) so
                    # each piece DMA is one contiguous block
                    src = hbm[kind].at[j, piece]
                else:  # w2: row pieces are contiguous in (S, INTER, DF)
                    src = hbm[kind].at[j, pl.ds(piece * rows, rows), :]
            return pltpu.make_async_copy(src, buf[kind].at[slot],
                                         sem[kind].at[slot])

        if S:
            for kind in _ORDER:
                dma(kind, jnp.int32(0)).start()
                if total[kind] > 1:
                    dma(kind, jnp.int32(1)).start()

        def consume(kind, t):
            """Wait piece t, return a reader over it, and prefetch t+2."""
            slot = jax.lax.rem(t, jnp.int32(2))
            dma(kind, t).wait()

            @pl.when(t + 2 < total[kind])
            def _():
                dma(kind, t + 2).start()

            return slot

        def quant_x(x):
            ax = jnp.max(jnp.abs(x))
            xs = ax / 127.0
            xq = jnp.clip(jnp.round(x / jnp.maximum(xs, 1e-12)),
                          -127, 127).astype(jnp.int8)
            return xq, xs

        def mv(x, read_cols, scale_row, o_dim):
            """Chunked matvec: read_cols(c0, c) -> (I, c) int8."""
            if variant == "w8a8":
                xq, xs = quant_x(x)
            outs = []
            for c0 in range(0, o_dim, o_chunk):
                c = min(o_chunk, o_dim - c0)
                wq = read_cols(c0, c)
                s_cols = scale_row[c0:c0 + c][None, :]
                if variant == "w8a8":
                    outs.append(_dot_w8a8(xq, wq, s_cols, xs))
                else:
                    outs.append(_dot_bf16(x, wq, s_cols))
            return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)

        def layer_compute(x, readers, scales):
            u = mv(x, readers["qkv"], scales["qkv"], DQKV)
            q = u[:, :DF]
            kvs = jnp.sum(u[:, DF:]) * 1e-3
            y = q * (1.0 + kvs)  # mock attention (see module docstring)
            x = x + mv(y, readers["wo"], scales["wo"], DF)
            h = _rms(x)
            f = mv(h, readers["w13"], scales["w13"], 2 * INTER)
            g = jax.nn.silu(f[:, :INTER]) * f[:, INTER:]
            x = x + mv(g, readers["w2"], scales["w2"], DF)
            return _rms(x)

        def step_body(s, x):
            def resident_body(l, x):
                readers = {
                    kind: (lambda c0, c, kind=kind, l=l:
                           res[kind][l, :, pl.ds(c0, c)])
                    for kind in _ORDER
                }
                scales = {k: sc[k][l] for k in _ORDER}
                return layer_compute(x, readers, scales)

            if R:
                x = jax.lax.fori_loop(0, R, resident_body, x)

            def streamed_body(j, x):
                t1 = s * S + j  # single-piece kinds' sequence index
                slots = {}
                slots["qkv"] = consume("qkv", t1)
                slots["wo"] = consume("wo", t1)
                if big_pieces:
                    slots["w13a"] = consume("w13", t1)
                    slots["w2a"] = consume("w2", t1)
                else:
                    # two-piece kinds: both pieces of layer j are items
                    # 2*t1 and 2*t1+1
                    slots["w13a"] = consume("w13", 2 * t1)
                    slots["w13b"] = consume("w13", 2 * t1 + 1)
                    slots["w2a"] = consume("w2", 2 * t1)
                    slots["w2b"] = consume("w2", 2 * t1 + 1)

                def read_qkv(c0, c):
                    return buf["qkv"][slots["qkv"], :, pl.ds(c0, c)]

                def read_wo(c0, c):
                    return buf["wo"][slots["wo"], :, pl.ds(c0, c)]

                if big_pieces:
                    def read_w13(c0, c):
                        return buf["w13"][slots["w13a"], :, pl.ds(c0, c)]

                    def read_w2(c0, c):
                        return buf["w2"][slots["w2a"], :, pl.ds(c0, c)]
                else:
                    def read_w13(c0, c):
                        # chunks never straddle the INTER boundary because
                        # o_chunk divides INTER
                        piece = c0 // INTER
                        slot = jnp.where(piece == 0, slots["w13a"],
                                         slots["w13b"])
                        off = c0 - piece * INTER
                        return buf["w13"][slot, :, pl.ds(off, c)]

                    def read_w2(c0, c):
                        return jnp.concatenate(
                            [buf["w2"][slots["w2a"], :, pl.ds(c0, c)],
                             buf["w2"][slots["w2b"], :, pl.ds(c0, c)]], axis=0
                        )

                lidx = R + j
                readers = {"qkv": read_qkv, "wo": read_wo,
                           "w13": read_w13, "w2": read_w2}
                scales = {k: sc[k][lidx] for k in _ORDER}
                return layer_compute(x, readers, scales)

            if S:
                x = jax.lax.fori_loop(0, S, streamed_body, x)
            return x

        x = x_ref[:].astype(jnp.float32)
        x = jax.lax.fori_loop(0, STEPS, step_body, x)
        o_ref[:] = x

    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]  # x
    if R:
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4  # scales
    in_specs += [pl.BlockSpec(memory_space=pltpu.ANY)] * 4  # streamed HBM

    scratch = [pltpu.VMEM((2,) + _KINDS[k][:2], jnp.int8) for k in _ORDER]  # noqa: local _KINDS
    scratch += [pltpu.SemaphoreType.DMA((2,)) for _ in _ORDER]

    @jax.jit
    def run(x, weights):
        args = [x]
        if R:
            args += [weights["res"][k] for k in _ORDER]
        args += [weights["sc"][k] for k in _ORDER]
        args += [weights["hbm"][k] for k in _ORDER]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, DF), jnp.float32),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=130 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*args)

    return run


def make_weights(r_resident: int, big_pieces: bool = False):
    """Random int8 weights + f32 scales in the probe's layout. Streamed
    w13 is stored pre-split as (S, 2, DF, INTER) so each column piece is
    one contiguous DMA; w2 row pieces are contiguous as stored."""
    rng = np.random.default_rng(0)
    R = r_resident

    full = {
        "qkv": (NL, DF, DQKV),
        "wo": (NL, DF, DF),
        "w13": (NL, DF, 2 * INTER),
        "w2": (NL, INTER, DF),
    }
    res, hbm, sc = {}, {}, {}
    for kind, (n, i, o) in full.items():
        w = rng.integers(-127, 128, size=(n, i, o), dtype=np.int32).astype(
            np.int8
        )
        res[kind] = jnp.asarray(w[:R])
        streamed = w[R:]
        if kind == "w13" and not big_pieces:
            streamed = np.stack(
                [streamed[..., :INTER], streamed[..., INTER:]], axis=1
            )  # (S, 2, DF, INTER)
        hbm[kind] = jnp.asarray(streamed)
        sc[kind] = jnp.asarray(
            rng.random((NL, o), dtype=np.float32) * (0.04 / 127.0)
        )
    return {"res": res, "hbm": hbm, "sc": sc}


def _bench(r_resident, variant, repeats=3, frames=30, big_pieces=False):
    import time

    run = make_probe(r_resident, variant, big_pieces=big_pieces)
    weights = make_weights(r_resident, big_pieces=big_pieces)
    x = jnp.ones((1, DF), jnp.float32) * 0.01
    t0 = time.perf_counter()
    out = run(x, weights)
    out.block_until_ready()
    compile_s = time.perf_counter() - t0
    assert np.isfinite(np.asarray(out)).all(), "non-finite probe output"
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        y = x
        for _ in range(frames):
            y = run(y, weights)
        y.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / frames)
    s = NL - r_resident
    traffic = (r_resident + STEPS * s) * 34.6e6  # bytes (int8)
    print(
        f"R={r_resident} variant={variant}"
        f"{' big_pieces' if big_pieces else ''}: {best*1e3:.2f} ms/frame "
        f"(effective {traffic/best/1e9:.0f} GB/s over {traffic/1e9:.2f} GB; "
        f"compile {compile_s:.0f}s; XLA fast-stack baseline ~6.4 ms)",
        flush=True,
    )
    return best


if __name__ == "__main__":
    import sys

    rs = [int(a) for a in sys.argv[1:] if a.isdigit()] or [0, 1, 2]
    variants = [a for a in sys.argv[1:] if a in ("bf16", "w8a8")] or [
        "bf16", "w8a8"
    ]
    big = "big" in sys.argv[1:]
    for variant in variants:
        for r in rs:
            try:
                _bench(r, variant, big_pieces=big)
            except Exception as e:
                print(f"R={r} variant={variant}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
