"""
Training-loop hooks (callbacks).

Capability parity with reference `neurite/tf/callbacks.py` (cites per class),
adapted to the functional train loop (`neurite_tpu.training.fit`): hooks
receive (step, state=TrainState, logs=dict). The keras multi-GPU variant
ModelCheckpointParallel (`callbacks.py:484-607`) is intentionally absent —
under pjit there is a single logical model (SURVEY.md §2.7).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from neurite_tpu import modelio


class ModelWeightCheck:
    """
    Assert no nan/inf parameters; optionally log the max weight change.

    Parity: reference `callbacks.py:39-90`. One fused jnp.isfinite reduction
    over the parameter pytree (cheap, stays on device until the assert).
    """

    def __init__(self, weight_diff=False, at_batch_end=1, at_epoch_end=True):
        self.at_batch_end = at_batch_end
        self.weight_diff = weight_diff
        self.wts = None

    def on_batch_end(self, batch, state=None, logs=None):
        if self.at_batch_end and (batch + 1) % self.at_batch_end == 0:
            self._check(state, logs)

    def on_train_end(self, state):
        self._check(state, None)

    def _check(self, state, logs):
        leaves = jax.tree_util.tree_leaves(state.params)
        finite = jnp.all(jnp.stack(
            [jnp.all(jnp.isfinite(w)) for w in leaves]))
        assert bool(finite), 'Found nan/infinite weights in model'

        if self.weight_diff:
            wts = [np.asarray(w) for w in leaves]
            diff = -np.inf
            if self.wts is not None:
                for w, pw in zip(wts, self.wts):
                    diff = np.maximum(diff, np.max(np.abs(w - pw)))
            self.wts = wts
            if logs is not None:
                logs['max_diff'] = diff


class CheckLossTrend:
    """
    Sliding-window loss-spike detector: warn beyond nb_std_err standard
    errors, raise when loss exceeds 100x the window mean.

    Parity: reference `callbacks.py:93-147`.
    """

    def __init__(self, at_batch_end=1, nb_std_err=2, loss_window=10):
        self.at_batch_end = at_batch_end
        self.nb_std_err = nb_std_err
        self.loss_window = loss_window
        self.losses = []

    def on_batch_end(self, batch, state=None, logs=None):
        if not (self.at_batch_end and (batch + 1) % self.at_batch_end == 0):
            return
        loss = logs['loss']
        if len(self.losses) < self.loss_window:
            self.losses = [*self.losses, loss]
            return
        losses_mean = np.mean(self.losses)
        losses_std = np.std(self.losses)
        if loss > losses_mean + self.nb_std_err * losses_std:
            print(f'Found loss {loss}, which is much higher than '
                  f'{losses_mean} + {losses_std}', file=sys.stderr)
        # magnitude-based spike gate: the reference compares
        # `loss - mean > mean * 100` (`callbacks.py:141-144`), which misfires
        # for negative losses (e.g. soft-Dice); compare magnitudes instead
        if (loss - losses_mean) > (abs(losses_mean) * 100):
            raise ValueError(f'Found loss {loss}, which is much higher '
                             f'than {losses_mean} * 100')
        self.losses = [*self.losses[1:], loss]


class TimeHistory:
    """Record per-step wall times (ref `callbacks.py:610-628`)."""

    def on_train_begin(self, state):
        self.times = []
        self._t0 = time.time()

    def on_batch_end(self, batch, state=None, logs=None):
        t = time.time()
        self.times.append(t - self._t0)
        self._t0 = t


class LRLog:
    """Inject the current learning rate into logs (ref `callbacks.py:631-641`)."""

    def __init__(self, schedule=None):
        self.schedule = schedule

    def on_batch_end(self, batch, state=None, logs=None):
        if logs is None:
            return
        if self.schedule is not None:
            logs['lr'] = float(self.schedule(int(state.step)))
        else:
            # look for a common optax hyperparams location
            try:
                logs['lr'] = float(
                    state.opt_state.hyperparams['learning_rate'])
            except Exception:
                pass


class ModelCheckpoint:
    """
    Periodic checkpointing with best-only monitoring.

    Parity: reference `callbacks.py:349-481` (epoch/iteration saves,
    monitor/save_best_only logic), built on `neurite_tpu.modelio.save_model`
    — which also persists optimizer state/step, so resume is exact.
    """

    def __init__(self, filepath, monitor='loss', save_best_only=False,
                 mode='min', at_batch_end=None, verbose=False, config=None):
        self.filepath = filepath
        self.monitor = monitor
        self.save_best_only = save_best_only
        self.at_batch_end = at_batch_end
        self.verbose = verbose
        self.config = config or {}
        self.best = np.inf if mode == 'min' else -np.inf
        self.mode = mode

    def _better(self, value):
        return value < self.best if self.mode == 'min' else value > self.best

    def on_batch_end(self, batch, state=None, logs=None):
        if not (self.at_batch_end and (batch + 1) % self.at_batch_end == 0):
            return
        value = logs.get(self.monitor)
        if self.save_best_only and value is not None:
            if not self._better(value):
                return
            self.best = value
        path = self.filepath.format(step=int(state.step),
                                    **{k: v for k, v in (logs or {}).items()
                                       if np.isscalar(v)})
        modelio.save_model(path, self.config,
                           {'params': state.params, **dict(state.variables)},
                           step=state.step, opt_state=state.opt_state)
        if self.verbose:
            print(f'saved checkpoint to {path}')

    def on_train_end(self, state):
        if self.at_batch_end is None:
            path = self.filepath.format(step=int(state.step))
            modelio.save_model(path, self.config,
                               {'params': state.params,
                                **dict(state.variables)},
                               step=state.step, opt_state=state.opt_state)


class PredictMetrics:
    """
    Run metric fns over a validation iterator; write CSV or inject
    '<metric>_label_<id>' into logs.

    Parity: reference `callbacks.py:250-346` (whole-volume prediction via
    `ne.utils.seg.predict_volumes` is handled by passing `vol_params`).
    """

    def __init__(self, filepath, metrics, data_generator, nb_samples,
                 nb_labels, apply_fn=None, label_ids=None, vol_params=None,
                 at_batch_end=None, period=1, verbose=False):
        self.filepath = filepath
        self.metrics = metrics
        self.data_generator = data_generator
        self.nb_samples = nb_samples
        self.nb_labels = nb_labels
        self.apply_fn = apply_fn
        self.label_ids = label_ids or list(range(nb_labels))
        self.vol_params = vol_params
        self.at_batch_end = at_batch_end
        self.period = period
        self.verbose = verbose

    def on_batch_end(self, batch, state=None, logs=None):
        if not (self.at_batch_end and (batch + 1) % self.at_batch_end == 0):
            return
        self._run(state, int(state.step), logs)

    def on_train_end(self, state):
        if self.at_batch_end is None:
            self._run(state, int(state.step), None)

    def _predict(self, state, x):
        if self.apply_fn is not None:
            return self.apply_fn(state, x)
        variables = {'params': state.params, **dict(state.variables)}
        return state.apply_fn(variables, x, training=False)

    def _run(self, state, step, logs):
        met = np.zeros((self.nb_samples, self.nb_labels, len(self.metrics)))
        for i in range(self.nb_samples):
            x, y_true = next(self.data_generator)
            y_pred = self._predict(state, x)
            for idx, metric in enumerate(self.metrics):
                val = np.asarray(metric(y_true, y_pred))
                met[i, :, idx] = np.mean(val.reshape(-1, self.nb_labels), 0) \
                    if val.size >= self.nb_labels else val
        if self.filepath is not None:
            for idx, metric in enumerate(self.metrics):
                filen = self.filepath.format(
                    step=step, metric=getattr(metric, '__name__', f'm{idx}'))
                np.savetxt(filen, met[:, :, idx], fmt='%f', delimiter=',')
        elif logs is not None:
            meanmet = np.nanmean(met, axis=0)
            for midx, metric in enumerate(self.metrics):
                name = getattr(metric, '__name__', f'm{midx}')
                for idx in range(self.nb_labels):
                    logs[f'{name}_label_{self.label_ids[idx]}'] = \
                        meanmet[idx, midx]


class PlotTestSlices:
    """
    Save mid-slice prediction figures at intervals.

    Parity: reference `callbacks.py:150-247` (whose plotting dependency is
    broken there — `show_example_prediction_result` is an unresolved import,
    `callbacks.py:226`); here we render directly with ne.plot.slices.
    """

    def __init__(self, savefilepath, generator, vol_size, at_batch_end=None,
                 apply_fn=None, verbose=False):
        self.savefilepath = savefilepath
        self.generator = generator
        self.vol_size = vol_size
        self.at_batch_end = at_batch_end
        self.apply_fn = apply_fn
        self.verbose = verbose

    def on_batch_end(self, batch, state=None, logs=None):
        if not (self.at_batch_end and (batch + 1) % self.at_batch_end == 0):
            return
        from neurite_tpu.py import plot as neplot
        import matplotlib
        matplotlib.use('Agg')

        x, y = next(self.generator)
        if self.apply_fn is not None:
            pred = self.apply_fn(state, x)
        else:
            variables = {'params': state.params, **dict(state.variables)}
            pred = state.apply_fn(variables, x, training=False)
        pred = np.asarray(pred)
        x = np.asarray(x)

        # mid-slices of the first item: input, argmax prediction
        item_x, item_p = x[0, ..., 0], np.argmax(pred[0], -1)
        if item_x.ndim == 3:
            mid = item_x.shape[-1] // 2
            item_x, item_p = item_x[..., mid], item_p[..., mid]
        fig, _ = neplot.slices([item_x, item_p], show=False)
        fig.savefig(self.savefilepath.format(step=int(state.step)))
        import matplotlib.pyplot as plt
        plt.close(fig)


class ModelCheckpointParallel(ModelCheckpoint):
    """
    Reference `ModelCheckpointParallel` (`callbacks.py:484-607`) existed to
    unwrap keras multi-GPU replica wrappers before saving. Under pjit/SPMD
    there is one logical model whatever the mesh, so this is simply
    `ModelCheckpoint` — kept for API parity.
    """
