import time, numpy as np, jax, jax.numpy as jnp
from radixjoin_tpu.engine.pipeline import _fja_ranged_fused
from radixjoin_tpu.perf.measurements import trace, device_module_times

n = 1 << 26
runs = max(1, n >> 22)
nf = n // runs
span = max(1024, nf // 16)
domain = span * runs
odd_d, odd_f = 2654435761 | 1, 0x9E3779B1 ^ 0x40
dup = 2

def r_source(k, n_runs):
    i = jnp.arange(span, dtype=jnp.uint32)
    keys = jnp.uint32(k * span) + ((i * jnp.uint32(odd_d)) & jnp.uint32(span - 1))
    keys = jnp.tile(keys, dup)
    return keys, jnp.arange(keys.shape[0], dtype=jnp.uint32)

def s_source(k, n_runs):
    i = jnp.arange(nf, dtype=jnp.uint32)
    keys = jnp.uint32(k * span) + ((i * jnp.uint32(odd_f)) & jnp.uint32(span - 1))
    return keys, i

def sync(x): np.asarray(jax.device_get(jnp.ravel(x)[0:1]))

out = _fja_ranged_fused(r_source, s_source, runs, domain, nf, span*dup,
                        span, None, None, None, None)
sync(out[3])
t0 = time.perf_counter()
out = _fja_ranged_fused(r_source, s_source, runs, domain, nf, span*dup,
                        span, None, None, None, None)
sync(out[3])
print("warm", time.perf_counter() - t0, "s for 2^26 fact rows", flush=True)
import os; os.system("rm -rf /tmp/r5trace_sf")
with trace("/tmp/r5trace_sf"):
    out = _fja_ranged_fused(r_source, s_source, runs, domain, nf, span*dup,
                            span, None, None, None, None)
    sync(out[3])
# per-op attribution: parse device plane op lines
import glob
from tensorflow.tsl.profiler.protobuf import xplane_pb2
files = sorted(glob.glob("/tmp/r5trace_sf/**/*.xplane.pb", recursive=True))
xs = xplane_pb2.XSpace(); xs.ParseFromString(open(files[-1], "rb").read())
for p in xs.planes:
    if "TPU" not in p.name and not p.name.startswith("/device:"):
        continue
    md = p.event_metadata
    for ln in p.lines:
        tot = {}
        for ev in ln.events:
            nm = md[ev.metadata_id].name if ev.metadata_id in md else "?"
            tot[nm] = tot.get(nm, 0.0) + ev.duration_ps / 1e9
        top = sorted(tot.items(), key=lambda kv: -kv[1])[:14]
        print("LINE", ln.name, flush=True)
        for nm, ms in top:
            print(f"  {ms:9.1f} ms  {nm[:90]}", flush=True)
