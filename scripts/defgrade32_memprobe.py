"""Memory analysis (AOT, no execution) of the round-4 chunk-32 crasher.

`scripts/defgrade32_repro.py` isolated the round-4 TPU worker crash to the
full 10k-pair lincomb under the FORCED legacy route (grad_solver='df64'
-> grid route) at pair_chunk=32: the same program at a 400-pair Gram
(A=20) runs clean, every single-chunk stage at the identical slab
geometry runs clean, and today's default (stream-free gen_df adjoint)
runs the full 10k pairs clean.  That leaves total-HBM pressure as the
scale-dependent variable.  This probe LOWERS AND COMPILES the exact
crashing program (and the passing A=20 / default-route variants for
contrast) and prints XLA's memory analysis -- argument, output, temp and
total bytes -- WITHOUT executing, so the worker stays alive.

Run:  python -u scripts/defgrade32_memprobe.py [A] [chunk]
"""
import os
import sys

os.environ.setdefault("JAX_ENABLE_X64", "true")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import sigkernel_tpu as sk

A = int(sys.argv[1]) if len(sys.argv) > 1 else 100
CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 32
LENGTH = 1024
DY = 1

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
k = sk.RBFKernel(1.0)
Xg = jnp.asarray(rng.normal(size=(A, LENGTH, 3)).cumsum(1)
                 * (1.0 / np.sqrt(LENGTH)))
Yg = jnp.asarray(rng.normal(size=(A, LENGTH, 3)).cumsum(1)
                 * (1.0 / np.sqrt(LENGTH)))
W = jnp.asarray(rng.normal(size=(A, A)))


def report(tag, gs):
    def loss(x):
        return sk.sig_gram_lincomb(k, x, Yg, W, dyadic_order=DY,
                                   grad_solver=gs, pair_chunk=CHUNK)

    lowered = jax.jit(jax.value_and_grad(loss)).lower(Xg)
    compiled = lowered.compile()
    m = compiled.memory_analysis()
    try:
        gb = 1.0 / 1e9
        print(f"{tag}: args={m.argument_size_in_bytes*gb:.3f} GB  "
              f"out={m.output_size_in_bytes*gb:.3f} GB  "
              f"temp={m.temp_size_in_bytes*gb:.3f} GB  "
              f"total={(m.argument_size_in_bytes + m.output_size_in_bytes + m.temp_size_in_bytes)*gb:.3f} GB",
              flush=True)
    except AttributeError:
        print(f"{tag}: memory_analysis={m}", flush=True)


report(f"A={A} chunk={CHUNK} df64 grid route (round-4 crasher)", "df64")
report(f"A={A} chunk={CHUNK} default (gen_df)               ", "auto")
print("MEMPROBE_OK", flush=True)
