import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
import __graft_entry__
fn, args = __graft_entry__.entry()
t0 = time.perf_counter()
out = jax.jit(fn)(*args)
print("entry compile+run ok:", np.asarray(out).shape, f"{time.perf_counter()-t0:.1f}s", flush=True)
