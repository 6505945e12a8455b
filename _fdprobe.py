import time
import jax, jax.numpy as jnp, numpy as np
from fish_speech_tpu.ops.pallas_decode import flash_decode_attention, flash_decode_reference

rng = np.random.default_rng(0)
L, B, S, HKV, GP, D = 2, 1, 512, 2, 8, 128
q = jnp.asarray(rng.normal(size=(B, HKV, GP, D)).astype(np.float32)).astype(jnp.bfloat16)
k = (jnp.asarray(rng.normal(size=(L, B, S, HKV, D)).astype(np.float32)) * 0.1).astype(jnp.bfloat16)
v = (jnp.asarray(rng.normal(size=(L, B, S, HKV, D)).astype(np.float32)) * 0.1).astype(jnp.bfloat16)
lens = jnp.asarray([300], jnp.int32)
t0 = time.perf_counter()
got = flash_decode_attention(q, k, v, jnp.int32(1), lens, block_s=256)
jax.block_until_ready(got)
print(f"tiny kernel compiled+ran in {time.perf_counter()-t0:.1f}s", flush=True)
want = flash_decode_reference(q, k, v, 1, lens)
d = float(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)).max())
print("max diff:", d, flush=True)
