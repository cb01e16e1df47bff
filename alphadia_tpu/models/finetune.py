"""Transfer learning: fine-tune property models on search results.

(reference: alphadia/transferlearning/train.py ``FinetuneManager`` — same
contract: train/val/test split, warmup + reduce-on-plateau LR schedule,
early stopping, per-epoch test metrics, models persisted to a directory the
next search step consumes via ``library_prediction.peptdeep_model_path``;
metrics per alphadia/transferlearning/metrics.py — linear-regression R²,
abs-error percentile@95, L1, MS2 spectral angle, charge accuracy.)

Models here are the self-contained flax models of models/property_models.py
(trained from scratch if no prior state exists — they are small enough that
"fine-tuning" and "training" coincide).
"""

from __future__ import annotations

import pickle
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd

from alphadia_tpu.models.property_models import (
    FRAG_COLS,
    MAX_CHARGE,
    ChargeModel,
    MobilityModel,
    MS2Model,
    RTModel,
    encode_sequences,
)
from alphadia_tpu.reporting import logger

MODEL_DIR_NAME = "peptdeep.transfer"


def _spectral_angle(a, b, axis=-1, eps=1e-9):
    na = np.linalg.norm(a, axis=axis)
    nb = np.linalg.norm(b, axis=axis)
    cos = (a * b).sum(axis=axis) / np.maximum(na * nb, eps)
    cos = np.clip(cos, -1, 1)
    return 1 - 2 * np.arccos(cos) / np.pi


def _r2(y_true, y_pred):
    ss_res = np.sum((y_true - y_pred) ** 2)
    ss_tot = np.sum((y_true - y_true.mean()) ** 2)
    return 1 - ss_res / max(ss_tot, 1e-12)


class _Trainer:
    """Shared training loop: warmup + plateau LR, early stopping."""

    def __init__(self, config: dict | None = None):
        cfg = config or {}
        self.batch_size = cfg.get("batch_size", 2000)
        self.max_lr = cfg.get("max_lr", 1e-4) * 30  # small models train faster
        self.epochs = cfg.get("epochs", 51)
        self.warmup_epochs = cfg.get("warmup_epochs", 5)
        # patience below ~6 strands training at the first noisy plateau
        # now that the warmup/halving schedule actually scales updates
        # (swept: patience 3 -> R2 0.58, patience 6 -> 0.85 at 30 epochs)
        self.lr_patience = cfg.get("lr_patience", 6)
        self.train_fraction = cfg.get("train_fraction", 0.7)
        self.validation_fraction = cfg.get("validation_fraction", 0.2)
        self.test_fraction = cfg.get("test_fraction", 0.1)
        self.test_interval = max(int(cfg.get("test_interval", 1)), 1)
        # None = auto (scan on accelerators, eager steps on CPU); tests
        # pin it to prove both strategies train identically
        self.force_scan: bool | None = None
        self.nce = cfg.get("nce", 25)
        self.instrument = cfg.get("instrument", "Lumos")
        total = self.train_fraction + self.validation_fraction + self.test_fraction
        if abs(total - 1.0) > 1e-6:
            logger.warning(
                f"transfer_learning split fractions sum to {total:.3f}; "
                "the test split absorbs the remainder after train+val"
            )

    def split(self, n, rng):
        perm = rng.permutation(n)
        n_train = int(n * self.train_fraction)
        n_val = int(n * self.validation_fraction)
        return (
            perm[:n_train],
            perm[n_train : n_train + n_val],
            perm[n_train + n_val :],
        )

    def fit(self, model, variables, inputs: tuple, target, loss_fn, rng):
        """Generic mini-batch loop. inputs: tuple of arrays sharing axis 0."""
        n = len(target)
        train_idx, val_idx, test_idx = self.split(n, rng)
        if len(train_idx) < 2:
            return variables, {}
        tx = optax.adam(self.max_lr)
        opt_state = tx.init(variables)

        # Epoch-level control flow (warmup, plateau LR halving, early
        # stop, best-snapshot) is data-dependent and stays host-side. The
        # inner batch loop has two compiled strategies:
        #  - accelerators: ONE lax.scan per epoch (a per-batch loop costs
        #    a ~24 ms dispatch round trip per step through the remote-TPU
        #    tunnel, plus a fresh gathered upload each step);
        #  - CPU: per-batch jitted steps over device-resident arrays —
        #    XLA:CPU executes while-loop (scan) bodies with crippled
        #    intra-op parallelism, measured ~70x slower than the same
        #    steps dispatched eagerly.
        def _train_body(p, o, ins, tgt, idx, lr_scale):
            batch_in = tuple(jnp.take(a, idx, axis=0) for a in ins)
            batch_t = jnp.take(tgt, idx, axis=0)

            def loss(q):
                return loss_fn(model.apply(q, *batch_in), batch_t)

            _, grads = jax.value_and_grad(loss)(p)
            updates, new_opt = tx.update(grads, o)
            # warmup/plateau schedule must scale the UPDATE, not the
            # gradient — Adam normalizes away any constant gradient
            # scaling (m / sqrt(v)), which silently made it a no-op
            updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
            return optax.apply_updates(p, updates), new_opt

        @jax.jit
        def train_epoch(params, opt_state, ins, tgt, idx_mat, lr_scale):
            def one(carry, idx):
                p, o = carry
                # idx[0] < 0 marks a padded step (step counts are bucketed
                # to powers of two so compiled variants stay few)
                p2, o2 = jax.lax.cond(
                    idx[0] >= 0,
                    lambda _: _train_body(p, o, ins, tgt, idx, lr_scale),
                    lambda _: (p, o),
                    None,
                )
                return (p2, o2), jnp.float32(0.0)

            (params, opt_state), _ = jax.lax.scan(one, (params, opt_state), idx_mat)
            return params, opt_state

        train_step = jax.jit(_train_body)
        use_scan = (
            self.force_scan
            if self.force_scan is not None
            else jax.default_backend() != "cpu"
        )

        @jax.jit
        def eval_loss(params, batch_in, batch_t):
            return loss_fn(model.apply(params, *batch_in), batch_t)

        dev_in = tuple(jnp.asarray(a) for a in inputs)
        dev_t = jnp.asarray(target)
        # held-out splits upload once, not once per epoch
        vin = tuple(jnp.asarray(a[val_idx]) for a in inputs) if len(val_idx) else None
        vt = jnp.asarray(target[val_idx]) if len(val_idx) else None
        tin = tuple(jnp.asarray(a[test_idx]) for a in inputs) if len(test_idx) else None
        tt = jnp.asarray(target[test_idx]) if len(test_idx) else None

        bs = min(self.batch_size, len(train_idx))
        nb = max(len(train_idx) // bs, 1)
        nb_pad = 1 << int(np.ceil(np.log2(nb)))
        best_val = np.inf
        best_vars = variables
        plateau = 0
        lr_scale = 1.0
        history = []
        test_history = []
        for epoch in range(self.epochs):
            if epoch < self.warmup_epochs:
                scale = lr_scale * (epoch + 1) / self.warmup_epochs
            else:
                scale = lr_scale
            order = rng.permutation(len(train_idx))
            if use_scan:
                idx_mat = np.full((nb_pad, bs), -1, np.int32)
                for b in range(nb):
                    idx_mat[b] = train_idx[order[b * bs : (b + 1) * bs]]
                variables, opt_state = train_epoch(
                    variables, opt_state, dev_in, dev_t,
                    jnp.asarray(idx_mat), jnp.float32(scale),
                )
            else:
                for b in range(nb):
                    idx = train_idx[order[b * bs : (b + 1) * bs]]
                    variables, opt_state = train_step(
                        variables, opt_state, dev_in, dev_t,
                        jnp.asarray(idx.astype(np.int32)), jnp.float32(scale),
                    )
            vloss = float(eval_loss(variables, vin, vt)) if vin is not None else 0.0
            history.append(vloss)
            # held-out test metric every test_interval epochs
            if tin is not None and epoch % self.test_interval == 0:
                test_history.append((epoch, float(eval_loss(variables, tin, tt))))
            if vloss < best_val - 1e-6:
                best_val = vloss
                best_vars = variables
                plateau = 0
            else:
                plateau += 1
                if plateau >= self.lr_patience:
                    lr_scale *= 0.5
                    plateau = 0
                if lr_scale < 1e-2:
                    break
        info = {"val_loss": best_val, "history": history}
        if test_history:
            info["test_history"] = test_history
        if tin is not None:
            info["test_loss"] = float(eval_loss(best_vars, tin, tt))
        return best_vars, info


class FinetuneManager:
    def __init__(self, config: dict | None = None, random_state: int = 0):
        self.trainer = _Trainer(config)
        self.rng = np.random.default_rng(random_state)
        self.variables: dict = {}
        self.metrics: dict[str, dict] = {}

    # ------------------------------------------------------------------
    def finetune_rt(self, psm_df: pd.DataFrame) -> dict:
        """psm_df needs sequence/mods/mod_sites + rt_norm (0..1 observed)."""
        tokens, mod_mass = encode_sequences(
            psm_df["sequence"].tolist(),
            psm_df.get("mods", pd.Series([""] * len(psm_df))).tolist(),
            psm_df.get("mod_sites", pd.Series([""] * len(psm_df))).tolist(),
        )
        target = psm_df["rt_norm"].to_numpy(np.float32)
        model = RTModel()
        variables = self.variables.get("rt") or model.init(
            jax.random.PRNGKey(0), tokens[:2], mod_mass[:2]
        )
        loss = lambda pred, t: jnp.abs(pred - t).mean()
        variables, info = self.trainer.fit(
            model, variables, (tokens, mod_mass), target, loss, self.rng
        )
        self.variables["rt"] = variables
        pred = np.asarray(model.apply(variables, tokens, mod_mass))
        err = np.abs(pred - target)
        self.metrics["rt"] = {
            "r2": _r2(target, pred),
            "abs_error_95": float(np.percentile(err, 95)),
            "l1": float(err.mean()),
            **info,
        }
        logger.log(25, f"finetune rt: R2={self.metrics['rt']['r2']:.3f}")
        return self.metrics["rt"]

    # ------------------------------------------------------------------
    def finetune_charge(self, psm_df: pd.DataFrame) -> dict:
        """Multi-label observed charges per modified sequence."""
        grouped = psm_df.groupby("mod_seq_hash").agg(
            sequence=("sequence", "first"),
            mods=("mods", "first"),
            mod_sites=("mod_sites", "first"),
            charges=("charge", lambda c: set(int(x) for x in c)),
        )
        tokens, mod_mass = encode_sequences(
            grouped["sequence"].tolist(),
            grouped["mods"].tolist(),
            grouped["mod_sites"].tolist(),
        )
        target = np.zeros((len(grouped), MAX_CHARGE), np.float32)
        for i, charges in enumerate(grouped["charges"]):
            for z in charges:
                if 1 <= z <= MAX_CHARGE:
                    target[i, z - 1] = 1.0
        model = ChargeModel()
        variables = self.variables.get("charge") or model.init(
            jax.random.PRNGKey(1), tokens[:2], mod_mass[:2]
        )

        def loss(pred, t):
            p = jnp.clip(pred, 1e-6, 1 - 1e-6)
            return -(t * jnp.log(p) + (1 - t) * jnp.log(1 - p)).mean()

        variables, info = self.trainer.fit(
            model, variables, (tokens, mod_mass), target, loss, self.rng
        )
        self.variables["charge"] = variables
        pred = np.asarray(model.apply(variables, tokens, mod_mass))
        acc = float((((pred > 0.5) == (target > 0.5))).mean())
        self.metrics["charge"] = {"accuracy": acc, **info}
        logger.log(25, f"finetune charge: accuracy={acc:.3f}")
        return self.metrics["charge"]

    # ------------------------------------------------------------------
    def finetune_ms2(self, psm_df: pd.DataFrame, frag_df: pd.DataFrame) -> dict:
        """frag_df: per-PSM fragments (type/charge/position/intensity)."""
        from alphadia_tpu.models.property_models import MAX_LEN

        keep = psm_df.reset_index(drop=True)
        tokens, mod_mass = encode_sequences(
            keep["sequence"].tolist(),
            keep.get("mods", pd.Series([""] * len(keep))).tolist(),
            keep.get("mod_sites", pd.Series([""] * len(keep))).tolist(),
        )
        charge = keep["charge"].to_numpy(np.int32)
        col_of = {c: j for j, c in enumerate(FRAG_COLS)}
        target = np.zeros((len(keep), MAX_LEN - 1, len(FRAG_COLS)), np.float32)
        # the transfer table holds up to top_k_samples rows per precursor
        # (one per run) — key fragments by (run, precursor_idx) so every
        # row gets ITS run's spectrum, not last-write-wins on the final
        # duplicate while the others train toward all-zero targets
        if "run" in keep.columns and "run" in frag_df.columns:
            frag_groups = frag_df.groupby(["run", "precursor_idx"])
            row_of = {
                (r, int(p)): i
                for i, (r, p) in enumerate(
                    zip(keep["run"], keep["precursor_idx"])
                )
            }
            key_of = lambda pid: (pid[0], int(pid[1]))  # noqa: E731
        else:
            frag_groups = frag_df.groupby("precursor_idx")
            row_of = {int(p): i for i, p in enumerate(keep["precursor_idx"])}
            key_of = int
        for pid, g in frag_groups:
            i = row_of.get(key_of(pid))
            if i is None:
                continue
            for t, z, pos, inten in zip(g["type"], g["charge"], g["position"], g["intensity"]):
                cname = f"{chr(int(t))}_z{int(z)}"
                j = col_of.get(cname)
                if j is not None and 0 <= int(pos) < MAX_LEN - 1:
                    target[i, int(pos), j] = inten
        peak = target.max(axis=(1, 2), keepdims=True)
        target = target / np.maximum(peak, 1e-9)

        model = MS2Model()
        variables = self.variables.get("ms2") or model.init(
            jax.random.PRNGKey(2), tokens[:2], mod_mass[:2], jnp.asarray(charge[:2])
        )
        loss = lambda pred, t: ((pred - t) ** 2).mean()
        variables, info = self.trainer.fit(
            model, variables, (tokens, mod_mass, charge), target, loss, self.rng
        )
        self.variables["ms2"] = variables
        pred = np.asarray(model.apply(variables, tokens, mod_mass, jnp.asarray(charge)))
        sa = _spectral_angle(
            pred.reshape(len(keep), -1), target.reshape(len(keep), -1)
        )
        self.metrics["ms2"] = {"spectral_angle": float(np.nanmean(sa)), **info}
        logger.log(25, f"finetune ms2: SA={self.metrics['ms2']['spectral_angle']:.3f}")
        return self.metrics["ms2"]

    # ------------------------------------------------------------------
    def finetune_ccs(self, psm_df: pd.DataFrame) -> dict:
        if "mobility_observed" not in psm_df.columns or (
            psm_df["mobility_observed"].abs() < 1e-3
        ).all():
            logger.info("no mobility dimension; skipping ccs finetune")
            return {}
        tokens, mod_mass = encode_sequences(
            psm_df["sequence"].tolist(),
            psm_df.get("mods", pd.Series([""] * len(psm_df))).tolist(),
            psm_df.get("mod_sites", pd.Series([""] * len(psm_df))).tolist(),
        )
        charge = psm_df["charge"].to_numpy(np.int32)
        target = psm_df["mobility_observed"].to_numpy(np.float32)
        model = MobilityModel()
        variables = self.variables.get("ccs") or model.init(
            jax.random.PRNGKey(3), tokens[:2], mod_mass[:2], jnp.asarray(charge[:2])
        )
        loss = lambda pred, t: jnp.abs(pred - t).mean()
        variables, info = self.trainer.fit(
            model, variables, (tokens, mod_mass, charge), target, loss, self.rng
        )
        self.variables["ccs"] = variables
        pred = np.asarray(model.apply(variables, tokens, mod_mass, jnp.asarray(charge)))
        self.metrics["ccs"] = {"r2": _r2(target, pred), **info}
        return self.metrics["ccs"]

    # ------------------------------------------------------------------
    def save(self, directory: str | Path) -> None:
        directory = Path(directory)
        directory.mkdir(parents=True, exist_ok=True)
        state = {
            k: jax.tree_util.tree_map(np.asarray, v) for k, v in self.variables.items()
        }
        with open(directory / "models.pkl", "wb") as f:
            pickle.dump(
                {
                    "variables": state,
                    "metrics": self.metrics,
                    # acquisition context the models were tuned on
                    # (transfer_learning.nce / .instrument)
                    "meta": {
                        "nce": self.trainer.nce,
                        "instrument": self.trainer.instrument,
                    },
                },
                f,
            )

    @classmethod
    def load(cls, directory: str | Path, config=None) -> "FinetuneManager":
        obj = cls(config)
        with open(Path(directory) / "models.pkl", "rb") as f:
            state = pickle.load(f)
        obj.variables = {
            k: jax.tree_util.tree_map(jnp.asarray, v)
            for k, v in state["variables"].items()
        }
        obj.metrics = state.get("metrics", {})
        return obj

    # ------------------------------------------------------------------
    # inference is chunked to a fixed batch shape so proteome-scale
    # libraries (millions of precursors) neither blow memory with one
    # giant apply nor compile a fresh graph per library size: at most two
    # executables per model (the fixed chunk + one small-input shape)
    PREDICT_BATCH = 8192

    def _batched(self, fn, *arrays) -> np.ndarray:
        n = len(arrays[0])
        B = self.PREDICT_BATCH
        if n <= B:
            return np.asarray(fn(*arrays))
        outs = []
        for s in range(0, n, B):
            e = min(s + B, n)
            chunk = [a[s:e] for a in arrays]
            if e - s < B:  # pad the tail to keep the compiled shape
                pad = B - (e - s)
                chunk = [
                    np.concatenate([c, np.repeat(c[-1:], pad, axis=0)])
                    for c in chunk
                ]
            outs.append(np.asarray(fn(*chunk))[: e - s])
        return np.concatenate(outs)

    def predict_rt(self, sequences, mods=None, mod_sites=None) -> np.ndarray:
        tokens, mod_mass = encode_sequences(sequences, mods, mod_sites)
        fn = jax.jit(partial(RTModel().apply, self.variables["rt"]))
        return self._batched(fn, tokens, mod_mass)

    def predict_ms2(
        self, sequences, mods, mod_sites, charges, nce: float = 25.0
    ) -> np.ndarray:
        tokens, mod_mass = encode_sequences(sequences, mods, mod_sites)
        fn = jax.jit(
            lambda t, m, c: MS2Model().apply(
                self.variables["ms2"], t, m, c, nce
            )
        )
        return self._batched(fn, tokens, mod_mass, np.asarray(charges))

    def predict_charge(self, sequences, mods=None, mod_sites=None) -> np.ndarray:
        tokens, mod_mass = encode_sequences(sequences, mods, mod_sites)
        fn = jax.jit(partial(ChargeModel().apply, self.variables["charge"]))
        return self._batched(fn, tokens, mod_mass)

    def predict_mobility(
        self, sequences, mods, mod_sites, charges
    ) -> np.ndarray:
        from alphadia_tpu.models.property_models import MobilityModel

        tokens, mod_mass = encode_sequences(sequences, mods, mod_sites)
        fn = jax.jit(partial(MobilityModel().apply, self.variables["ccs"]))
        return self._batched(fn, tokens, mod_mass, np.asarray(charges))
