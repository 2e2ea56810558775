#!/bin/bash
timeout 100 python -c "
import threading, jax, jax.numpy as jnp
box={}
def r():
    try: box['v']=int(jax.device_get(jnp.sum(jnp.arange(8192))))
    except Exception: pass
t=threading.Thread(target=r, daemon=True); t.start(); t.join(60)
print('tunnel alive' if box.get('v')==8191*8192//2 else 'tunnel DEAD')
" 2>&1 | grep -v WARNING | head -1
