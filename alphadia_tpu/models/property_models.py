"""Peptide property models (RT / charge / MS2 / mobility) in flax.

Role of alphaPeptDeep in the reference (reference:
alphadia/transferlearning/train.py — fine-tuned rt/charge/ms2/ccs models;
alphadia/libtransform/prediction.py — library prediction): self-contained
JAX models trained from scratch or fine-tuned on the transfer library built
from search results.

Architecture (shared): residue-token embedding + modification-mass channel
-> two 1D conv blocks (local context) -> property heads:
- RT / mobility: masked mean-pool -> MLP -> scalar (normalized units)
- charge: masked mean-pool -> MLP -> sigmoid multi-label over charges 1..6
- MS2: per cleavage site (concat of flanking states + charge/NCE features)
  -> MLP -> intensities per fragment type/charge, relu, max-normalized

Sequences are encoded to fixed length MAX_LEN with 0-padding.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from alphadia_tpu.library import chem

MAX_LEN = 35
VOCAB = "ACDEFGHIKLMNPQRSTVWYU"
TOKEN_OF = {aa: i + 1 for i, aa in enumerate(VOCAB)}  # 0 = pad
MAX_CHARGE = 6
FRAG_COLS = ("b_z1", "b_z2", "y_z1", "y_z2")


def encode_sequences(
    sequences, mods=None, mod_sites=None, max_len: int = MAX_LEN
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (tokens i32[B, L], mod_mass f32[B, L])."""
    n = len(sequences)
    tokens = np.zeros((n, max_len), np.int32)
    mod_mass = np.zeros((n, max_len), np.float32)
    for i, seq in enumerate(sequences):
        s = str(seq)[:max_len]
        tokens[i, : len(s)] = [TOKEN_OF.get(a, 0) for a in s]
        if mods is not None and mods[i]:
            names = [m for m in str(mods[i]).split(";") if m]
            sites = [x for x in str(mod_sites[i]).split(";") if x != ""]
            for name, site in zip(names, sites):
                pos = int(site)
                idx = 0 if pos <= 0 else min(pos - 1, max_len - 1)
                try:
                    mod_mass[i, idx] += chem.mod_delta_mass(name)
                except KeyError:
                    pass
    return tokens, mod_mass / 100.0  # scale to O(1)


class SequenceEncoder(nn.Module):
    dim: int = 64

    @nn.compact
    def __call__(self, tokens, mod_mass):
        mask = (tokens > 0).astype(jnp.float32)[..., None]  # [B, L, 1]
        x = nn.Embed(len(VOCAB) + 1, self.dim)(tokens)
        x = x + nn.Dense(self.dim)(mod_mass[..., None])
        x = x * mask
        h = nn.relu(nn.Conv(self.dim, (5,), padding="SAME")(x))
        h = nn.relu(nn.Conv(self.dim, (5,), padding="SAME")(h)) + x
        return h * mask, mask


def _masked_pool(h, mask):
    """Mean-pool plus a length feature (additive properties need length)."""
    length = mask.sum(axis=1)
    mean = (h * mask).sum(axis=1) / jnp.maximum(length, 1.0)
    return jnp.concatenate([mean, length / 35.0], axis=-1)


class RTModel(nn.Module):
    dim: int = 64

    @nn.compact
    def __call__(self, tokens, mod_mass):
        h, mask = SequenceEncoder(self.dim)(tokens, mod_mass)
        p = _masked_pool(h, mask)
        p = nn.relu(nn.Dense(self.dim)(p))
        return nn.Dense(1)(p)[..., 0]  # normalized rt


class MobilityModel(nn.Module):
    dim: int = 64

    @nn.compact
    def __call__(self, tokens, mod_mass, charge):
        h, mask = SequenceEncoder(self.dim)(tokens, mod_mass)
        p = _masked_pool(h, mask)
        p = jnp.concatenate([p, charge[..., None].astype(jnp.float32) / 4.0], axis=-1)
        p = nn.relu(nn.Dense(self.dim)(p))
        return nn.Dense(1)(p)[..., 0]


class ChargeModel(nn.Module):
    dim: int = 64

    @nn.compact
    def __call__(self, tokens, mod_mass):
        h, mask = SequenceEncoder(self.dim)(tokens, mod_mass)
        p = _masked_pool(h, mask)
        p = nn.relu(nn.Dense(self.dim)(p))
        return nn.sigmoid(nn.Dense(MAX_CHARGE)(p))  # P(charge z observable)


class MS2Model(nn.Module):
    dim: int = 64
    n_frag_cols: int = len(FRAG_COLS)

    @nn.compact
    def __call__(self, tokens, mod_mass, charge, nce=25.0):
        h, mask = SequenceEncoder(self.dim)(tokens, mod_mass)
        left = h[:, :-1, :]  # state before cleavage site
        right = h[:, 1:, :]
        z = jnp.broadcast_to(
            (charge[..., None, None].astype(jnp.float32) / 4.0),
            (*left.shape[:2], 1),
        )
        nce_f = jnp.full_like(z, nce / 100.0)
        site = jnp.concatenate([left, right, z, nce_f], axis=-1)
        site = nn.relu(nn.Dense(self.dim)(site))
        out = nn.relu(nn.Dense(self.n_frag_cols)(site))  # [B, L-1, F]
        site_mask = (tokens[:, 1:] > 0).astype(jnp.float32)[..., None]
        out = out * site_mask
        peak = out.max(axis=(1, 2), keepdims=True)
        return out / jnp.maximum(peak, 1e-6)
