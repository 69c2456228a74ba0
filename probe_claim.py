import time, jax, jax.numpy as jnp
t0=time.time(); print("devices:", jax.devices(), flush=True)
x = jnp.ones((128,128)); (x@x).block_until_ready()
print(f"matmul ok in {time.time()-t0:.1f}s", flush=True)
