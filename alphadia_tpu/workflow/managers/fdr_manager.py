"""Versioned FDR classifier store.

(reference: alphadia/workflow/managers/fdr_manager.py:54-348 — keeps a
stack of trained classifiers, one per fit_predict call; `version=-1` trains
a new classifier warm-started from the latest; a specific version scores
without retraining; decoy strategies precursor / precursor_channel_wise /
channel.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from alphadia_tpu.fdr.fdr import perform_fdr
from alphadia_tpu.models.classifier import BinaryClassifier
from alphadia_tpu.reporting import logger
from alphadia_tpu.workflow.managers.base import BaseManager


class FDRManager(BaseManager):
    def __init__(
        self,
        feature_columns: list[str],
        classifier_base: BinaryClassifier | None = None,
        path=None,
        load_from_file=False,
        dia_cycle: np.ndarray | None = None,
        config=None,
        figure_path: str | None = None,
        random_state: int | None = None,
    ):
        super().__init__(path, load_from_file)
        if not self.is_loaded_from_file:
            # a successful load() already restored the trained classifier
            # store and its feature columns (the classifier input dim is
            # tied to them) — don't clobber them with fresh defaults
            self.feature_columns = feature_columns
            self.classifier_base = classifier_base or BinaryClassifier()
            self.classifier_store: list[BinaryClassifier] = []
        # per-run runtime context always comes from the constructor
        self.dia_cycle = dia_cycle
        self.config = config
        self.figure_path = figure_path
        self._rng = np.random.default_rng(random_state)

    @property
    def current_version(self) -> int:
        return len(self.classifier_store) - 1

    # ------------------------------------------------------------------
    def fit_predict(
        self,
        features_df: pd.DataFrame,
        decoy_strategy: str = "precursor",
        competitive: bool = True,
        df_fragments: pd.DataFrame | None = None,
        version: int = -1,
    ) -> pd.DataFrame:
        available = [c for c in self.feature_columns if c in features_df.columns]
        classifier = self._get_classifier(version)
        train_new = version == -1

        if decoy_strategy == "precursor_channel_wise":
            # one classifier over all channels, q-values fit per channel
            # (reference fdr_manager decoy strategies)
            pieces = []
            for _, sub in features_df.groupby("channel"):
                pieces.append(
                    perform_fdr(
                        classifier,
                        available,
                        sub[sub["decoy"] == 0].copy(),
                        sub[sub["decoy"] == 1].copy(),
                        competitive=competitive,
                        group_channels=False,
                        df_fragments=df_fragments,
                        dia_cycle=self.dia_cycle,
                        random_state=int(self._rng.integers(0, 2**31)),
                    )
                )
            psm_df = pd.concat(pieces, ignore_index=True)
        elif decoy_strategy == "precursor":
            psm_df = perform_fdr(
                classifier,
                available,
                features_df[features_df["decoy"] == 0].copy(),
                features_df[features_df["decoy"] == 1].copy(),
                competitive=competitive,
                group_channels=True,
                df_fragments=df_fragments,
                dia_cycle=self.dia_cycle,
                random_state=int(self._rng.integers(0, 2**31)),
                figure_path=self.figure_path,
            )
        else:
            raise NotImplementedError(f"decoy strategy {decoy_strategy}")

        if train_new:
            if classifier.fitted:
                self.classifier_store.append(classifier)
                logger.info(f"FDR classifier version {self.current_version} trained")
            else:
                # perform_fdr took a fallback path (logistic regression /
                # zero decoys) and never fit the NN — storing it would
                # make the current version unusable for predict()
                logger.info(
                    "FDR used a fallback estimator; classifier store "
                    f"stays at version {self.current_version}"
                )
        return psm_df

    def _get_classifier(self, version: int) -> BinaryClassifier:
        if version >= 0 and version < len(self.classifier_store):
            return self.classifier_store[version]
        # new classifier, warm started from the latest fitted one, else from
        # a packaged pretrained state keyed by the feature-column hash
        # (reference: fdr_manager.py:296-321 + constants/classifier/*.pth)
        if self.classifier_store and self.classifier_store[-1].fitted:
            return BinaryClassifier.from_state_dict(
                self.classifier_store[-1].to_state_dict()
            )
        packaged = self._load_packaged_classifier()
        if packaged is not None:
            return packaged
        return BinaryClassifier.from_state_dict(self.classifier_base.to_state_dict())

    def feature_hash(self) -> str:
        import xxhash

        return xxhash.xxh64_hexdigest("|".join(sorted(self.feature_columns)))

    def _load_packaged_classifier(self) -> BinaryClassifier | None:
        import pickle
        from pathlib import Path

        path = (
            Path(__file__).parents[2]
            / "constants"
            / "classifier"
            / f"{self.feature_hash()}.pkl"
        )
        if not path.exists():
            return None
        try:
            with open(path, "rb") as f:
                clf = BinaryClassifier.from_state_dict(pickle.load(f))
            # adopt the runtime hyperparameters, keep the pretrained weights
            clf.test_size = self.classifier_base.test_size
            clf.epochs = self.classifier_base.epochs
            clf.experimental_hyperparameter_tuning = (
                self.classifier_base.experimental_hyperparameter_tuning
            )
            clf.random_state = self.classifier_base.random_state
            logger.info(f"warm-starting FDR classifier from {path.name}")
            return clf
        except Exception as e:
            logger.warning(f"could not load packaged classifier: {e}")
            return None

    def predict(self, features_df: pd.DataFrame, version: int = -1) -> pd.DataFrame:
        """Score with an existing classifier without retraining."""
        if not self.classifier_store:
            raise RuntimeError(
                "no trained FDR classifier available yet (all fits so far "
                "used fallback estimators)"
            )
        clf = self.classifier_store[version]
        available = [c for c in self.feature_columns if c in features_df.columns]
        X = features_df[available].to_numpy(np.float32)
        out = features_df.copy()
        out["proba"] = clf.predict_proba(X)[:, 1]
        return out
