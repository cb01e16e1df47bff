"""Target–decoy classifier (feed-forward NN) in flax/optax.

Behavioral contract (reference: alphadia/fdr/classifiers.py:145-530
``BinaryClassifierLegacyNewBatching`` + ``FeedForwardNN``):

- architecture: BatchNorm(input) -> [Dense -> ReLU -> Dropout] over layers
  [100, 50, 20, 5] -> Dense(2) -> softmax;
- loss: binary cross-entropy on the softmax outputs vs one-hot labels;
- optimizer: Adam with coupled L2 weight decay (1e-5);
- training: `epochs` passes over batches of `batch_size`, batch order
  shuffled with a seeded numpy RNG; internal train/test split (test_size);
- optional hyperparameter scaling: batch = clip(n/1e6*4096, 128, 4096),
  lr = base_lr * sqrt(batch/4096) (classifiers.py:104-141);
- state is serializable for the versioned FDR-manager store.
"""

from __future__ import annotations

import functools
import io
import pickle

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


class FeedForwardNN(nn.Module):
    layers: tuple = (100, 50, 20, 5)
    output_dim: int = 2
    dropout: float = 0.001

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        for h in self.layers:
            x = nn.Dense(h)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.output_dim)(x)
        return nn.softmax(x, axis=-1)


def _scaled_training_params(n_samples, base_lr=0.001, max_batch=4096, min_batch=128):
    """(reference: classifiers.py `_get_scaled_training_params`)"""
    if n_samples >= 1_000_000:
        return max_batch, base_lr
    batch_size = int(np.clip((n_samples / 1_000_000) * max_batch, min_batch, max_batch))
    # round to a power of two: stable jit shapes across fits
    batch_size = 1 << int(np.ceil(np.log2(batch_size)))
    batch_size = min(batch_size, max_batch)
    return batch_size, base_lr * np.sqrt(batch_size / max_batch)


@functools.lru_cache(maxsize=32)
def _cached_train_step(layers, output_dim, dropout, learning_rate, weight_decay):
    """One jitted train program per hyperparameter combination — a fresh
    closure per fit() would recompile every call (minutes on the remote
    TPU compile path).

    Returns ``(tx, train_scan)`` where ``train_scan`` runs ALL training
    steps of a fit inside a single ``lax.scan``.  The per-batch Python
    loop it replaces cost one dispatch round trip (~24 ms through the
    remote-TPU tunnel) plus a host->device batch upload per step —
    thousands of round trips and ``epochs``× redundant upload bytes per
    fit.  The scan uploads the training matrix once and dispatches once.
    """
    model = FeedForwardNN(layers=layers, output_dim=output_dim, dropout=dropout)
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.adam(learning_rate),
    )

    def loss_fn(params, batch_stats, x, y, rng):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        p = jnp.clip(out, 1e-7, 1 - 1e-7)
        bce = -(y * jnp.log(p) + (1 - y) * jnp.log(1 - p)).mean()
        return bce, mutated["batch_stats"]

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @functools.partial(jax.jit, static_argnames=("bs",))
    def train_scan(params, batch_stats, opt_state, x, y, starts, key, *, bs):
        """Scan over row offsets ``starts`` (int32 [T]); ``start < 0``
        marks a padded step (state passes through unchanged — padding
        keeps the step count at a bucketed shape so compiled variants
        stay few)."""

        def step(carry, start):
            params, bstats, opt_state, key = carry
            key, sub = jax.random.split(key)

            def do(_):
                s = jnp.maximum(start, 0)
                xb = jax.lax.dynamic_slice_in_dim(x, s, bs, 0)
                yb = jax.lax.dynamic_slice_in_dim(y, s, bs, 0)
                (loss, new_bs), grads = grad_fn(params, bstats, xb, yb, sub)
                updates, new_opt = tx.update(grads, opt_state, params)
                return (
                    optax.apply_updates(params, updates),
                    new_bs,
                    new_opt,
                    loss,
                )

            def skip(_):
                return params, bstats, opt_state, jnp.float32(0.0)

            params2, bstats2, opt2, loss = jax.lax.cond(start >= 0, do, skip, None)
            return (params2, bstats2, opt2, key), loss

        (params, batch_stats, opt_state, _), losses = jax.lax.scan(
            step, (params, batch_stats, opt_state, key), starts
        )
        return params, batch_stats, opt_state, losses

    return tx, train_scan


@functools.lru_cache(maxsize=8)
def _cached_infer(layers, dropout):
    model = FeedForwardNN(layers=layers, output_dim=2, dropout=dropout)

    @jax.jit
    def infer(variables, xb):
        return model.apply(variables, xb, train=False)

    return infer


class BinaryClassifier:
    """fit / predict_proba classifier over PSM feature matrices."""

    def __init__(
        self,
        test_size: float = 0.001,
        batch_size: int = 5000,
        epochs: int = 10,
        learning_rate: float = 0.001,
        weight_decay: float = 1e-5,
        layers: tuple = (100, 50, 20, 5),
        dropout: float = 0.001,
        experimental_hyperparameter_tuning: bool = True,
        random_state: int | None = None,
    ):
        self.test_size = test_size
        self.batch_size = batch_size
        self.epochs = epochs
        self.learning_rate = learning_rate
        self.weight_decay = weight_decay
        self.layers = tuple(layers)
        self.dropout = dropout
        self.experimental_hyperparameter_tuning = experimental_hyperparameter_tuning
        self.random_state = random_state

        self.input_dim: int | None = None
        self.variables = None  # {'params', 'batch_stats'}
        self.metrics: dict[str, list] = {"train_loss": []}
        self._fitted = False

    @property
    def fitted(self) -> bool:
        return self._fitted

    # ------------------------------------------------------------------
    def fit(self, x: np.ndarray, y: np.ndarray) -> None:
        x = np.asarray(x, dtype=np.float32)
        y = np.asarray(y)
        if y.ndim == 1:
            y = np.stack([1 - y, y], axis=1).astype(np.float32)

        if self.experimental_hyperparameter_tuning:
            self.batch_size, self.learning_rate = _scaled_training_params(len(x))

        rng_np = np.random.default_rng(self.random_state)
        reinit = self.variables is None or self.input_dim != x.shape[1]
        self.input_dim = x.shape[1]
        model = FeedForwardNN(
            layers=self.layers, output_dim=y.shape[1], dropout=self.dropout
        )
        key = jax.random.PRNGKey(
            int(rng_np.integers(0, 2**31)) if self.random_state is not None else 0
        )
        if reinit:
            variables = model.init(key, jnp.zeros((2, self.input_dim)), train=False)
            params = variables["params"]
            batch_stats = variables["batch_stats"]
        else:
            params = self.variables["params"]
            batch_stats = self.variables["batch_stats"]

        # internal train/test split (reference uses test only for metrics)
        n = len(x)
        n_test = max(int(n * self.test_size), 1)
        perm = rng_np.permutation(n)
        train_idx = perm[n_test:]
        x_train, y_train = x[train_idx], y[train_idx]

        tx, train_scan = _cached_train_step(
            self.layers,
            y.shape[1],
            self.dropout,
            float(self.learning_rate),
            float(self.weight_decay),
        )
        opt_state = tx.init(params)

        bs = min(self.batch_size, len(x_train))
        num_batches = max(len(x_train) // bs, 1)

        # one lax.scan over every step of every epoch: a single device
        # dispatch instead of epochs*num_batches round trips, and the
        # training matrix uploads once instead of once per step.  Shapes
        # are bucketed (rows and steps-per-epoch padded to powers of two,
        # padded steps masked inside the scan) so the remote compile cache
        # sees only a handful of variants across a whole search.
        nb_pad = 1 << int(np.ceil(np.log2(num_batches)))
        starts = np.full((self.epochs, nb_pad), -1, np.int32)
        for e in range(self.epochs):
            starts[e, :num_batches] = rng_np.permutation(num_batches) * bs
        n_pad = 1 << int(np.ceil(np.log2(max(len(x_train), bs))))
        xt = np.zeros((n_pad, x.shape[1]), np.float32)
        xt[: len(x_train)] = x_train
        yt = np.zeros((n_pad, y.shape[1]), np.float32)
        yt[: len(y_train)] = y_train

        params, batch_stats, opt_state, losses = train_scan(
            params,
            batch_stats,
            opt_state,
            jnp.asarray(xt),
            jnp.asarray(yt),
            jnp.asarray(starts.reshape(-1)),
            key,
            bs=bs,
        )
        # per-epoch metric: loss of the last real batch in that epoch's
        # shuffled order (matches the prior per-step loop's bookkeeping)
        losses = np.asarray(losses).reshape(self.epochs, nb_pad)
        self.metrics["train_loss"].extend(
            float(v) for v in losses[:, num_batches - 1]
        )

        self.variables = {"params": params, "batch_stats": batch_stats}
        self._model = model
        self._fitted = True

    # ------------------------------------------------------------------
    def predict_proba(self, x: np.ndarray) -> np.ndarray:
        if not self._fitted:
            raise RuntimeError("classifier not fitted")
        x = np.asarray(x, dtype=np.float32)
        infer = _cached_infer(self.layers, self.dropout)

        # pad to a static shape to avoid one compile per call size
        n = len(x)
        pad_to = max(1024, 1 << int(np.ceil(np.log2(max(n, 1)))))
        xp = np.zeros((pad_to, x.shape[1]), np.float32)
        xp[:n] = x
        out = np.asarray(infer(self.variables, jnp.asarray(xp)))[:n]
        return out

    def predict(self, x: np.ndarray) -> np.ndarray:
        return np.argmax(self.predict_proba(x), axis=1)

    # ------------------------------------------------------------------
    def to_state_dict(self) -> dict:
        buf = io.BytesIO()
        pickle.dump(
            jax.tree_util.tree_map(np.asarray, self.variables)
            if self.variables is not None
            else None,
            buf,
        )
        return {
            "variables": buf.getvalue(),
            "input_dim": self.input_dim,
            "layers": self.layers,
            "dropout": self.dropout,
            "fitted": self._fitted,
            "batch_size": self.batch_size,
            "learning_rate": self.learning_rate,
        }

    @classmethod
    def from_state_dict(cls, state: dict) -> "BinaryClassifier":
        obj = cls(layers=state["layers"], dropout=state["dropout"])
        obj.input_dim = state["input_dim"]
        obj.batch_size = state["batch_size"]
        obj.learning_rate = state["learning_rate"]
        variables = pickle.loads(state["variables"])
        obj.variables = (
            jax.tree_util.tree_map(jnp.asarray, variables)
            if variables is not None
            else None
        )
        obj._fitted = state["fitted"]
        return obj
