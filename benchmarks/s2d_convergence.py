"""VERDICT r4 item 6: does the s2d throughput win survive at flagship scale?

The round-2 convergence evidence for `unet(space_to_depth=s)` was a toy 2-D
task; the 113 vol/s recommendation needs the 3-D 128^3 variant shown to
train to comparable Dice. This script:

  1. draws a FIXED synthetic dataset (train + val volumes) once with
     `labels_to_image_new` at 128^3 / 16 labels — the flagship config-#5
     distribution — so every variant sees byte-identical data;
  2. trains the parity UNet (s2d=1), s2d=2 and s2d=4 (the bench.py
     configurations) for the same step budget with the same adam schedule
     and batch order;
  3. reports train soft-Dice every EVAL_EVERY steps and final val soft-Dice.

Env knobs: S2D_STEPS (default 300), S2D_TRAIN/S2D_VAL (volumes, default
8/2), S2D_SIZE (default 128), S2D_VARIANTS (comma list, default "1,2,4").

Usage: python benchmarks/s2d_convergence.py
Exits non-zero if any variant diverges (final train Dice worse than 0.5 of
the parity model's), so it can gate the DESIGN.md recommendation.
"""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

import neurite_tpu as ne  # noqa: E402
from neurite_tpu import training  # noqa: E402

SIZE = int(os.environ.get('S2D_SIZE', 128))
STEPS = int(os.environ.get('S2D_STEPS', 300))
N_TRAIN = int(os.environ.get('S2D_TRAIN', 8))
N_VAL = int(os.environ.get('S2D_VAL', 2))
EVAL_EVERY = int(os.environ.get('S2D_EVAL_EVERY', 50))
VARIANTS = [int(s) for s in os.environ.get('S2D_VARIANTS', '1,2,4').split(',')]
NB_LABELS = 16
# adam(1e-3) diverged the parity model at 128^3 (loss -0.11 -> -0.09 ->
# NaN by step 100); 1e-4 + global-norm clipping is the stable default.
LR = float(os.environ.get('S2D_LR', 1e-4))

rng = np.random.default_rng(0)


def draw_labelmap(key):
    """SynthMorph-style blobby labelmap: argmax over NB_LABELS smooth
    perlin fields (white-noise labelmaps are unlearnable — the first run
    of this study plateaued every variant at -0.135 soft-Dice)."""
    fields = ne.utils.augment.draw_perlin(
        (SIZE, SIZE, SIZE, NB_LABELS), scales=(32, 64), min_std=.5,
        max_std=1., seed=key)
    return jnp.argmax(fields, -1).astype(jnp.int32)[None, ..., None]


def draw_dataset():
    """One synth program, N_TRAIN+N_VAL draws: (image f32, labels int8)."""
    # seeds={'mean': 7} pins the per-label intensity mapping across draws
    # (random per-volume mappings left intensity uncorrelated with labels
    # across the dataset — at a 300-step budget nothing could be learned:
    # all variants plateaued near -0.1); warp/bias/noise stay random.
    gen = ne.models.labels_to_image_new(
        labels_in=list(range(NB_LABELS)), out_shape=(SIZE,) * 3,
        one_hot=False, seeds={'mean': 7})
    lab0 = draw_labelmap(jax.random.PRNGKey(99))
    gv = jax.jit(gen.init)({'params': jax.random.PRNGKey(0),
                            'augment': jax.random.PRNGKey(1)}, lab0)

    @jax.jit
    def draw(key, lkey):
        out = gen.apply(gv, draw_labelmap(lkey), rngs={'augment': key})
        return out['image'], out['map']

    imgs, segs = [], []
    for i in range(N_TRAIN + N_VAL):
        img, seg = draw(jax.random.PRNGKey(1000 + i),
                        jax.random.PRNGKey(2000 + i))
        imgs.append(np.asarray(img, np.float32))
        segs.append(np.asarray(seg, np.int8).squeeze(-1))
    return (np.concatenate(imgs), np.concatenate(segs))


print(f'drawing {N_TRAIN}+{N_VAL} volumes at {SIZE}^3 ...', flush=True)
t0 = time.time()
images, seg_labels = draw_dataset()
print(f'  dataset in {time.time() - t0:.1f}s  '
      f'(labels used: {len(np.unique(seg_labels))}/{NB_LABELS})', flush=True)

train_x = jnp.asarray(images[:N_TRAIN])
val_x = jnp.asarray(images[N_TRAIN:])
train_seg = seg_labels[:N_TRAIN]
val_seg = seg_labels[N_TRAIN:]

loss_fn = ne.losses.SoftDice(check_input_limits=False).loss


def run_variant(s2d):
    model = ne.models.unet(
        nb_features=16, input_shape=(SIZE,) * 3 + (1,),
        nb_levels=4 if s2d <= 2 else 3, conv_size=3, nb_labels=NB_LABELS,
        feat_mult=2, nb_conv_per_level=2, dtype=jnp.bfloat16,
        conv_impl='auto', space_to_depth=s2d)
    x0 = train_x[:1]
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(LR))
    st = training.create_train_state(model, jax.random.PRNGKey(0), x0, tx)
    step = jax.jit(training.make_train_step(loss_fn), donate_argnums=(0,))

    @jax.jit
    def eval_dice(params, xx, yy):
        yp = model.apply({'params': params}, xx, training=False)
        return loss_fn(yy, yp)

    def onehot(seg_np):
        return jax.nn.one_hot(jnp.asarray(seg_np, jnp.int32), NB_LABELS)

    hist = []
    t0 = time.time()
    for i in range(STEPS):
        j = i % N_TRAIN
        xb = train_x[j:j + 1]
        yb = onehot(train_seg[j:j + 1])
        st, mm = step(st, (xb, yb), jax.random.PRNGKey(10 + i))
        if (i + 1) % EVAL_EVERY == 0 or i == 0:
            hist.append((i + 1, float(mm['loss'])))
            print(f'  s2d={s2d} step {i + 1:4d}: train soft-dice-loss '
                  f'{hist[-1][1]:+.4f}', flush=True)
    wall = time.time() - t0
    vd = float(np.mean([
        float(eval_dice(st.params, val_x[k:k + 1], onehot(val_seg[k:k + 1])))
        for k in range(N_VAL)]))
    return hist, vd, wall


results = {}
for s2d in VARIANTS:
    print(f'--- s2d={s2d} ---', flush=True)
    results[s2d] = run_variant(s2d)

print('\n| variant | final train loss | val soft-dice loss | '
      f'{STEPS}-step wall |', flush=True)
print('|---|---|---|---|', flush=True)
for s2d, (hist, vd, wall) in results.items():
    print(f'| s2d={s2d} | {hist[-1][1]:+.4f} | {vd:+.4f} | {wall:.1f}s |',
          flush=True)

# gate: a variant that reaches less than half the parity model's train Dice
# has diverged — exit non-zero so this can't silently pass
if 1 in results:
    par = -results[1][0][-1][1]
    bad = [s for s, (h, _, _) in results.items() if -h[-1][1] < 0.5 * par]
    if bad:
        print(f'DIVERGED vs parity: {bad}', flush=True)
        sys.exit(1)
print('OK', flush=True)
