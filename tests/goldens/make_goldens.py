"""
Generate committed golden parity fixtures (VERDICT r2 item 9; SURVEY §4
item 1): float64 pure-NUMPY oracles of the reference formulas on small fixed
volumes, saved to goldens.npz. tests/test_goldens.py asserts the framework
matches these at 1e-5 — so numerical parity stops being self-referential
(jnp vs jnp) and survives refactors of the jax implementations.

Oracles re-derive the REFERENCE math independently (cited per block from
/root/reference/neurite/tf), in float64, with no jax imports.

Run: python tests/goldens/make_goldens.py   (rewrites goldens.npz)
"""

import itertools
import os

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'goldens.npz')
EPS = 1e-7  # keras backend epsilon (reference metric formulas)


# ---------------------------------------------------------------- interpn
def interpn_oracle(vol, loc, method='linear', fill_value=None):
    """Reference `neurite/tf/utils/utils.py:73-220` in float64 numpy:
    linear path loops 2^N corners; corner-0 weight = clip(floor+1) - clip(loc);
    flat row-major gather with index clipping; fill masks OOB points."""
    vol = np.asarray(vol, np.float64)
    loc = np.asarray(loc, np.float64)
    nd = loc.shape[-1]
    squeeze = vol.ndim == nd
    if squeeze:
        vol = vol[..., None]
    vshape = vol.shape[:-1]
    maxl = [d - 1 for d in vshape]
    flat = vol.reshape(-1, vol.shape[-1])

    def take(subs):
        idx = subs[-1].astype(np.int64)
        k = np.cumprod(vshape[::-1])
        for i, v in enumerate(subs[:-1][::-1]):
            idx = idx + v.astype(np.int64) * int(k[i])
        idx = np.clip(idx, 0, flat.shape[0] - 1)
        return flat[idx]

    if method == 'linear':
        loc0 = np.floor(loc)
        clipped = [np.clip(loc[..., d], 0, maxl[d]) for d in range(nd)]
        loc0lst = [np.clip(loc0[..., d], 0, maxl[d]) for d in range(nd)]
        loc1 = [np.clip(loc0lst[d] + 1, 0, maxl[d]) for d in range(nd)]
        locs = [loc0lst, loc1]
        diff1 = [loc1[d] - clipped[d] for d in range(nd)]
        diff0 = [1 - d for d in diff1]
        wts = [diff1, diff0]
        out = 0.
        for c in itertools.product([0, 1], repeat=nd):
            subs = [locs[c[d]][d] for d in range(nd)]
            wt = np.prod(np.stack([wts[c[d]][d] for d in range(nd)]), 0)
            out = out + wt[..., None] * take(subs)
    else:
        subs = [np.clip(np.round(loc[..., d]), 0, maxl[d]) for d in range(nd)]
        out = take(subs)

    if fill_value is not None:
        oob = np.any((loc < 0) | (loc > np.asarray(maxl)), -1, keepdims=True)
        out = np.where(oob, fill_value, out)
    return out[..., 0] if squeeze else out


# ---------------------------------------------------------------- resize
def resize_oracle(vol, zoom, method='linear'):
    """Reference `utils.py:223-264`: linspace grids + interpn."""
    vol = np.asarray(vol, np.float64)
    nd = len(zoom)
    vshape = vol.shape[:nd]
    new_shape = [int(vshape[d] * zoom[d]) for d in range(nd)]
    grids = np.meshgrid(*[np.linspace(0., vshape[d] - 1., new_shape[d])
                          for d in range(nd)], indexing='ij')
    loc = np.stack(grids, -1)
    return interpn_oracle(vol, loc, method=method)


# ----------------------------------------------------------- soft_quantize
def soft_quantize_oracle(x, nb_bins=16, alpha=1., bin_centers=None,
                         min_clip=-np.inf, max_clip=np.inf):
    """Reference `utils.py:1095-1172`: RBF binning, centers from min/max."""
    x = np.asarray(x, np.float64)
    if bin_centers is None:
        bin_centers = np.linspace(x.min(), x.max(), nb_bins)
    x = np.clip(x[..., None], min_clip, max_clip)
    return np.exp(-alpha * np.square(x - np.asarray(bin_centers, np.float64)))


# --------------------------------------------------------------------- MI
def mi_volumes_oracle(x, y, nb_bins=16):
    """Reference `metrics.py:41-336`: sigma = 0.5/(B-1), alpha = 1/(2 s^2);
    joint pxy = x_q^T y_q; MI = sum pxy log(pxy/(px py + eps) + eps)."""
    sigma = 0.5 / (nb_bins - 1)
    alpha = 1. / (2. * sigma ** 2)
    bs = x.shape[0]
    xf = np.asarray(x, np.float64).reshape(1, bs, -1)   # channelwise layout
    yf = np.asarray(y, np.float64).reshape(1, bs, -1)
    xq = soft_quantize_oracle(xf, nb_bins, alpha)       # [1, bs, V, B]
    yq = soft_quantize_oracle(yf, nb_bins, alpha)
    out = []
    for b in range(bs):
        qx, qy = xq[0, b], yq[0, b]                     # [V, B]
        pxy = qx.T @ qy
        pxy = pxy / (pxy.sum() + EPS)
        px = qx.sum(0, keepdims=True)
        px = px / (px.sum() + EPS)
        py = qy.sum(0, keepdims=True)
        py = py / (py.sum() + EPS)
        pxpy = px.T @ py
        out.append(np.sum(pxy * np.log(pxy / (pxpy + EPS) + EPS)))
    return np.asarray(out)


# ------------------------------------------------------------------- dice
def dice_oracle(y_true, y_pred, laplace=0.):
    """Reference `metrics.py:339-519`: per (batch, label)
    2*sum(xy) / (sum(x^2) + sum(y^2)), safe division."""
    t = np.asarray(y_true, np.float64).reshape(y_true.shape[0], -1,
                                               y_true.shape[-1])
    p = np.asarray(y_pred, np.float64).reshape(y_pred.shape[0], -1,
                                               y_pred.shape[-1])
    top = 2 * np.sum(t * p, 1)
    bottom = np.sum(t * t, 1) + np.sum(p * p, 1)
    if laplace > 0:
        return (top + laplace) / (bottom + laplace)
    return np.where(bottom == 0, 0., top / np.where(bottom == 0, 1., bottom))


def main():
    rng = np.random.default_rng(20260817)
    g = {}

    # interpn: 3-D volume w/ channels, mixed in/out-of-bounds locations
    vol3 = rng.normal(size=(7, 6, 5, 2))
    loc3 = np.stack(np.meshgrid(*[np.arange(s, dtype=float)
                                  for s in (4, 5, 3)], indexing='ij'), -1)
    loc3 = loc3 + rng.uniform(-2.5, 2.5, size=loc3.shape)
    g['interpn_vol'] = vol3
    g['interpn_loc'] = loc3
    g['interpn_linear'] = interpn_oracle(vol3, loc3, 'linear')
    g['interpn_linear_fill'] = interpn_oracle(vol3, loc3, 'linear', -7.25)
    g['interpn_nearest'] = interpn_oracle(vol3, loc3, 'nearest')
    g['interpn_nearest_fill'] = interpn_oracle(vol3, loc3, 'nearest', -7.25)
    # 2-D no-channel variant
    vol2 = rng.normal(size=(9, 8))
    loc2 = np.stack(np.meshgrid(np.arange(6.), np.arange(7.),
                                indexing='ij'), -1)
    loc2 = loc2 + rng.uniform(-1.5, 1.5, size=loc2.shape)
    g['interpn2_vol'] = vol2
    g['interpn2_loc'] = loc2
    g['interpn2_linear'] = interpn_oracle(vol2, loc2, 'linear')

    # resize
    g['resize_vol'] = rng.normal(size=(6, 7, 5, 2))
    g['resize_up'] = resize_oracle(g['resize_vol'], (1.7, 1.3, 2.0))
    g['resize_down'] = resize_oracle(g['resize_vol'], (0.5, 0.75, 0.6))
    g['resize_nearest'] = resize_oracle(g['resize_vol'], (1.5, 1.5, 1.5),
                                        'nearest')

    # soft_quantize
    g['sq_x'] = rng.normal(size=(5, 6)) * 3
    g['sq_out'] = soft_quantize_oracle(g['sq_x'], nb_bins=8, alpha=2.)
    g['sq_centers'] = np.linspace(-2, 2, 5)
    g['sq_out_centers'] = soft_quantize_oracle(
        g['sq_x'], nb_bins=None, alpha=1., bin_centers=g['sq_centers'],
        min_clip=-2.5, max_clip=2.5)

    # MI: correlated pair
    base = rng.normal(size=(2, 4, 4, 3, 1))
    g['mi_x'] = base
    g['mi_y'] = 0.7 * base + 0.3 * rng.normal(size=base.shape)
    g['mi_out'] = mi_volumes_oracle(g['mi_x'], g['mi_y'], nb_bins=16)

    # Dice: probabilistic maps
    logits = rng.normal(size=(2, 4, 4, 4, 3))
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    onehot = np.eye(3)[rng.integers(0, 3, size=(2, 4, 4, 4))]
    g['dice_true'] = onehot
    g['dice_pred'] = probs
    g['dice_out'] = dice_oracle(onehot, probs)
    g['dice_out_laplace'] = dice_oracle(onehot, probs, laplace=1e-3)

    np.savez_compressed(OUT, **g)
    print(f'wrote {OUT} with {len(g)} arrays')


if __name__ == '__main__':
    main()
