"""
LC head formulation shootout at the 160^3 / C=4 / O=1 / k=3^3 shape
(447M params). In-step measurements (benchmarks/lc_head.py) showed every
P-materializing lane-friendly form LOSES to the plain per-tap loop:

    per-tap [V, C] (r2 default)      132.7 ms step
    one-hot-conv patches (r3 cand.)  157.5 ms step
    stacked-view patches (r3 cand.)  181.2 ms step

Hypothesis: per-tap's real cost is the KERNEL layout — kernel[:, t*C:(t+1)*C]
is a 4-of-108 minor-dim strided slice, so all 27 taps re-read full 108-lane
tiles (~27x the kernel bytes). With the kernel stored TRANSPOSED [T*C, V],
each tap's weights are dense full-lane ROWS and the x taps are fused strided
views of the padded volume — no patch tensor, no relayout, kernel read once.

Measures standalone fwd and fwd+bwd (fori_loop chains, two-point fit) for:
  pertap  : the r2 default (`layers.local._lc_per_tap`)
  transp  : transposed-kernel per-tap elementwise form
"""

import functools
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from neurite_tpu.layers.local import _lc_per_tap

size = int(os.environ.get('LC_SIZE', 160))
C = 4
ks = (3, 3, 3)
D = H = W = size
V = D * H * W
T = 27
K = T * C

rng = np.random.default_rng(0)
x_np = rng.normal(size=(D, H, W, C))
k_np = rng.normal(size=(K, V))  # transposed layout [taps*C, V]

x = jnp.asarray(x_np, jnp.bfloat16)
kT = jnp.asarray(k_np, jnp.bfloat16)
kV = jnp.asarray(np.moveaxis(k_np, 0, 1), jnp.bfloat16)  # [V, K] keras
g = jnp.asarray(rng.normal(size=(D, H, W)), jnp.float32)

taps = [(dz, dy, dx) for dz in range(3) for dy in range(3)
        for dx in range(3)]


def transp_fwd(xin, kTin):
    """y[v] = sum_{t,c} kT[t*C+c, v] * xpad[zc+dz, ..., c] — all operands
    keep V-major layouts; tap views are fused strided slices."""
    xcm = jnp.moveaxis(xin, -1, 0)                       # [C, D, H, W]
    xp = jnp.pad(xcm, ((0, 0), (1, 1), (1, 1), (1, 1)))
    k3 = kTin.reshape(K, D, H, W)
    y = jnp.zeros((D, H, W), jnp.float32)
    for t, (dz, dy, dx) in enumerate(taps):
        for c in range(C):
            tap = jax.lax.slice(xp, (c, dz, dy, dx),
                                (c + 1, dz + D, dy + H, dx + W))[0]
            y = y + k3[t * C + c].astype(jnp.float32) * tap.astype(jnp.float32)
    return y


def pertap_fwd(xin, kVin):
    y, _ = _lc_per_tap(xin[None], kVin[:, :, None], ks, (1, 1, 1), 'same', 1)
    return y.reshape(D, H, W)


def fit(step, args, n1=1, n2=5):
    def chain(n):
        @jax.jit
        def c(a):
            return jax.lax.fori_loop(0, n, lambda i, aa: step(*aa), a)
        return c
    ts = []
    for n in (n1, n2):
        cfn = chain(n)
        r = cfn(args)
        _ = np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
        t0 = time.time()
        r = cfn(args)
        _ = np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
        ts.append(time.time() - t0)
    return (ts[1] - ts[0]) / (n2 - n1)


def mk_fwd(fwd, kin):
    def step(xin, kk):
        y = fwd(xin, kk)
        return (xin + (y[..., None] * 1e-6).astype(xin.dtype), kk)
    return step, (x, kin)


def mk_grad(fwd, kin):
    def step(xin, kk):
        def loss(xin, kk):
            return jnp.sum(fwd(xin, kk) * g)
        dx, dk = jax.grad(loss, argnums=(0, 1))(xin, kk)
        return (xin + (dx * 1e-6).astype(xin.dtype),
                kk + (dk * 1e-6).astype(kk.dtype))
    return step, (x, kin)


print(f'V={V} C={C} K={K} backend={jax.default_backend()}', flush=True)

# parity first (cheap slices on CPU would differ in layout; do it on-chip)
if os.environ.get('LC_PARITY', '1') == '1':
    sl = (slice(0, 2), slice(0, 2), slice(0, 2))
    ya = np.asarray(jax.jit(transp_fwd)(x, kT), np.float32)
    yb = np.asarray(jax.jit(pertap_fwd)(x, kV), np.float32)
    d = float(np.abs(ya - yb).max())
    print(f'parity transp vs pertap: max abs diff {d:.3e}', flush=True)

which = sys.argv[1:] or ['transp_fwd', 'pertap_fwd', 'transp_grad',
                         'pertap_grad']
for name in which:
    fwd, kin = ((transp_fwd, kT) if name.startswith('transp')
                else (pertap_fwd, kV))
    step, args = (mk_fwd if name.endswith('fwd') else mk_grad)(fwd, kin)
    try:
        dt = fit(step, args)
        print(f'{name:12s} {dt * 1e3:8.2f} ms', flush=True)
    except Exception as e:
        print(f'{name:12s} FAILED: {type(e).__name__}: {str(e)[:160]}',
              flush=True)
