"""Generate the tutorial notebooks under nbs/tutorial_nbs/.

Mirrors the reference's tutorial set (reference repo nbs/tutorial_nbs/:
calibration, loess, optimization_simulation, protein_grouping, finetuning)
with notebooks authored for the alphadia_tpu APIs.  Notebooks are written
as nbformat v4 JSON; `tests/run_nb_tests.sh` executes them headlessly with
nbclient (finetuning excluded there, like the reference, for runtime).

Run: python scripts/generate_tutorial_nbs.py
"""

from pathlib import Path

import nbformat as nbf

OUT = Path(__file__).parents[1] / "nbs" / "tutorial_nbs"

_SETUP = """\
import jax

jax.config.update("jax_platforms", "cpu")  # tutorials run everywhere

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
"""


def _nb(cells):
    nb = nbf.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3",
        "language": "python",
        "name": "python3",
    }
    nb.cells = [
        nbf.v4.new_markdown_cell(src) if kind == "md" else nbf.v4.new_code_cell(src)
        for kind, src in cells
    ]
    return nb


# ----------------------------------------------------------------------
loess = [
    ("md", """\
# LOESS regression

alphadia_tpu calibrates observed quantities (retention time, m/z, ion
mobility) against library values with locally weighted regression.
`LOESSRegression` places polynomial kernels by *data density* (equal
numbers of points per kernel, not equal spacing), weights points with the
tricubic kernel, and blends the per-kernel fits into one smooth curve.

This notebook shows the model on a synthetic curve and how the two main
knobs — `n_kernels` and `polynomial_degree` — change the fit."""),
    ("code", _SETUP),
    ("code", """\
from alphadia_tpu.calibration.models import LOESSRegression

rng = np.random.default_rng(0)
x = np.sort(rng.uniform(0, 100, 400))
y_true = 8 * np.sin(x / 15) + 0.05 * x
y = y_true + rng.normal(0, 1.2, x.shape)"""),
    ("code", """\
fits = {}
for n_kernels, degree in [(1, 1), (2, 2), (6, 2)]:
    model = LOESSRegression(n_kernels=n_kernels, polynomial_degree=degree)
    model.fit(x, y)
    fits[(n_kernels, degree)] = model.predict(x)

fig, ax = plt.subplots(figsize=(8, 4))
ax.scatter(x, y, s=6, alpha=0.3, label="observations")
ax.plot(x, y_true, "k--", lw=1, label="truth")
for (k, d), pred in fits.items():
    ax.plot(x, pred, lw=2, label=f"n_kernels={k}, degree={d}")
ax.legend()
ax.set_xlabel("x")
ax.set_ylabel("y")
fig.tight_layout()"""),
    ("md", """\
With a single linear kernel the model underfits the sine; more kernels
track the local structure.  The residual spread of the densest fit is
close to the injected noise:"""),
    ("code", """\
resid = y - fits[(6, 2)]
print(f"residual std {resid.std():.2f} (injected noise 1.20)")
assert resid.std() < 1.6"""),
    ("md", """\
Density-based kernel placement matters for proteomics data: retention
times cluster in the gradient's middle, so equal-width kernels would
starve the sparse edges.  Peek at the chosen kernel boundaries:"""),
    ("code", """\
model = LOESSRegression(n_kernels=4, polynomial_degree=2)
model.fit(x, y)
print("kernel centers:   ", np.round(model.centers, 1))
print("kernel halfwidths:", np.round(model.halfwidths, 1))
# density placement: centers are closer together where the data is dense
assert len(model.centers) == 4"""),
]

# ----------------------------------------------------------------------
calibration = [
    ("md", """\
# Property calibration

During a search, alphadia_tpu learns the systematic deviation between
*library* values and *observed* values (mass error drift, RT shift,
mobility offset) and removes it.  `CalibrationEstimator` wraps a
regression model (LOESS by default) with the column plumbing and the
ppm-deviation transform used for m/z.

Here we simulate a mass-error drift of a few ppm across the m/z range
and calibrate it away."""),
    ("code", _SETUP),
    ("code", """\
from alphadia_tpu.calibration.estimator import CalibrationEstimator
from alphadia_tpu.calibration.models import LOESSRegression

rng = np.random.default_rng(1)
mz_library = np.sort(rng.uniform(300, 1200, 1000))
true_ppm = 4.0 + 3.0 * np.sin(mz_library / 300.0)  # instrument drift
mz_observed = mz_library * (1 + (true_ppm + rng.normal(0, 0.8, mz_library.shape)) * 1e-6)
df = pd.DataFrame({"mz_library": mz_library, "mz_observed": mz_observed})"""),
    ("code", """\
est = CalibrationEstimator(
    name="precursor_mz",
    function=LOESSRegression(n_kernels=6, polynomial_degree=2),
    input_columns=["mz_library"],
    target_columns=["mz_observed"],
    output_columns=["mz_calibrated"],
    transform_deviation=1e6,  # report deviations in ppm
)
ci95 = est.fit(df)
est.predict(df)  # adds mz_calibrated in place
print("95% residual CI after calibration:", ci95, "ppm")
print("metrics:", est.metrics)"""),
    ("code", """\
dev = est.calc_deviation(df)  # [observed_dev, calibrated_dev, residual, x]
fig, ax = plt.subplots(figsize=(8, 4))
ax.scatter(dev[:, 3], dev[:, 0], s=5, alpha=0.3, label="observed deviation (ppm)")
ax.plot(dev[:, 3], dev[:, 1], "r", lw=2, label="fitted drift")
ax.scatter(dev[:, 3], dev[:, 2], s=5, alpha=0.3, label="residual after calibration")
ax.axhline(0, color="k", lw=0.5)
ax.set_xlabel("m/z")
ax.set_ylabel("deviation (ppm)")
ax.legend()
fig.tight_layout()"""),
    ("code", """\
# the calibration removed the drift: residual accuracy ~ noise level
assert est.metrics["median_precision"] < 1.5
assert abs(np.median(dev[:, 2])) < 0.5"""),
    ("md", """\
In the real pipeline these estimators live in the `CalibrationManager`
(one group per quantity: precursor mz/rt/mobility, fragment mz) and are
refit on confident identifications after every optimization step; the
95% CI feeds the automatic tolerance optimizers shown in the
`optimization_simulation` notebook."""),
]

# ----------------------------------------------------------------------
optimization = [
    ("md", """\
# Automatic tolerance optimization — a simulation

alphadia_tpu narrows its search tolerances (MS1/MS2 ppm, RT seconds,
mobility) iteratively: search a calibration batch, estimate the residual
spread (95% CI) of confident IDs, propose a narrower tolerance, repeat —
converging when the identification feature plateaus.  This mirrors the
reference's automatic optimizers, including the optimum-row restore and
the `favour_narrower_optimum` rule.

This notebook runs the real `AutomaticMS2Optimizer` against a *simulated*
instrument so the convergence behavior is visible in isolation: the
simulated calibration CI tightens as the tolerance narrows (less chimeric
matching), and the ID count saturates once the tolerance covers the true
mass-error spread."""),
    ("code", _SETUP),
    ("code", """\
from alphadia_tpu.config import load_default_config
from alphadia_tpu.workflow.managers.optimization_manager import OptimizationManager
from alphadia_tpu.workflow.optimizers.automatic import AutomaticMS2Optimizer

TRUE_SPREAD_PPM = 7.0  # the instrument's real fragment mass-error spread


class SimCalibration:
    \"\"\"Stands in for CalibrationManager.get_estimator(...).ci(df, 0.95):
    the fitted residual CI approaches the true spread as the tolerance
    narrows toward it (tight windows reject chimeric matches).\"\"\"

    def __init__(self, om):
        self._om = om
        self.is_fitted = True

    def get_estimator(self, group, name):
        return self

    def ci(self, df, q):
        tol = self._om.ms2_error
        return TRUE_SPREAD_PPM + 0.15 * max(tol - TRUE_SPREAD_PPM, 0.0)


class SimFdr:
    current_version = 0


class SimLock:
    total_elution_groups = 1000
    batch_idx = 0


def simulated_ids(tol):
    \"\"\"IDs rise until the tolerance covers the true spread, then decay
    slowly as wider windows admit noise.\"\"\"
    coverage = min(tol / TRUE_SPREAD_PPM, 1.0)
    penalty = 1.0 - 0.004 * max(tol - TRUE_SPREAD_PPM, 0.0)
    return int(800 * coverage * penalty)"""),
    ("code", """\
cfg = load_default_config()
cfg.set_path("calibration.min_steps", 2)
om = OptimizationManager(cfg, gradient_length=1000.0)
opt = AutomaticMS2Optimizer(
    30.0, cfg, om, SimCalibration(om), SimFdr(), SimLock()
)

for step in range(10):
    if opt.has_converged:
        break
    n = simulated_ids(om.ms2_error)
    prec = pd.DataFrame({"precursor_idx": np.arange(n)})
    frag = pd.DataFrame({"mz_library": np.zeros(16)})
    opt.step(prec, frag)

print(f"converged: {opt.has_converged} after {len(opt.history_df)} steps")
opt.history_df[["parameter", opt._feature_name, "batch_idx"]]"""),
    ("code", """\
hist = opt.history_df
fig, ax1 = plt.subplots(figsize=(8, 4))
ax1.plot(hist.index, hist["parameter"], "o-", label="ms2 tolerance (ppm)")
ax1.axhline(TRUE_SPREAD_PPM, color="k", ls="--", lw=1, label="true spread")
ax1.set_xlabel("optimization step")
ax1.set_ylabel("tolerance (ppm)")
ax2 = ax1.twinx()
ax2.plot(hist.index, hist[opt._feature_name], "s--", color="tab:green",
         label="proportion detected")
ax2.set_ylabel("precursor proportion detected")
ax1.legend(loc="upper right")
fig.tight_layout()"""),
    ("code", """\
assert opt.has_converged
# the converged tolerance is restored from the optimum history row and
# sits near (not below) the simulated instrument spread
best = hist["parameter"].iloc[opt._find_index_of_optimum()]
assert om.ms2_error == best
print("final ms2 tolerance:", om.ms2_error, "ppm")
assert om.ms2_error >= TRUE_SPREAD_PPM * 0.8"""),
    ("md", """\
The trajectory shows the two rules working together: while the feature
keeps improving the optimizer keeps narrowing (each proposal =
`update_factor x CI`); once the feature plateaus within
`favour_narrower_optimum`'s threshold, the *narrowest* parameter among
the near-optimal rows wins, and the manager state is restored from that
row (classifier version, score cutoff, FWHM) — not from the last step."""),
]

# ----------------------------------------------------------------------
grouping = [
    ("md", """\
# Protein grouping and parsimony

Peptides shared between proteins make protein-level rollup ambiguous.
`perform_grouping` implements greedy set-cover parsimony over the
precursor->protein map, reproducing the classic interpretation taxonomy
(Nesvizhskii & Aebersold, MCP 2005): distinct, differentiable,
indistinguishable, subset, circular..."""),
    ("code", _SETUP),
    ("code", """\
from alphadia_tpu.outputs.grouping import perform_grouping


def grouping_demo(name, peptide_protein_lists):
    df = pd.DataFrame(
        {
            "precursor_idx": np.arange(len(peptide_protein_lists)),
            "proteins": peptide_protein_lists,
            "decoy": 0,
        }
    )
    out = perform_grouping(df, genes_or_proteins="proteins")
    out.insert(0, "case", name)
    return out[["case", "precursor_idx", "proteins", "pg_master", "pg"]]


cases = {
    "distinct": ["A", "A", "B", "B"],
    "differentiable": ["A", "A;B", "A;B", "B"],
    "indistinguishable": ["A;B", "A;B", "A;B", "A;B"],
    "subset": ["A", "A;B", "A;B", "A"],
    "circular": ["A;B", "B;C", "A;C"],
}
pd.concat([grouping_demo(k, v) for k, v in cases.items()], ignore_index=True)"""),
    ("md", """\
Reading the table:

- **distinct** — no shared peptides: every protein keeps its own group.
- **differentiable** — A and B each have a unique peptide, so both
  survive; the shared peptides are assigned to the first master by the
  greedy cover.
- **indistinguishable** — only shared evidence: one group remains and
  carries both accessions.
- **subset** — B has no unique evidence, so it is absorbed into A
  (maximum parsimony: one protein explains everything).
- **circular** — pairwise shared evidence with no unique peptides; the
  greedy cover still returns a minimal explanation set deterministically."""),
    ("code", """\
# decoys group separately from targets (independent parsimony universes)
df = pd.DataFrame(
    {
        "precursor_idx": np.arange(4),
        "proteins": ["A", "A;B", "A", "B"],
        "decoy": [0, 0, 1, 1],
    }
)
out = perform_grouping(df, genes_or_proteins="proteins")
out"""),
    ("code", """\
targets = out[out["decoy"] == 0]
decoys = out[out["decoy"] == 1]
assert (targets["pg_master"] == "A").all()  # B is a subset of A in targets
assert set(decoys["pg_master"]) == {"A", "B"}  # decoys grouped on their own"""),
    ("md", """\
In the pipeline this runs inside `SearchPlanOutput.build()` before
protein-level FDR: q-values are computed on the grouped `pg` column, and
the LFQ matrices roll up to these groups."""),
]

# ----------------------------------------------------------------------
finetuning = [
    ("md", """\
# Transfer learning: finetuning peptide property models

The `transfer` step of a multistep search collects confident PSMs from a
first pass and finetunes the peptide property models (RT, charge, MS2
intensities, CCS) on them, so the second pass searches with
run-calibrated predictions.  `FinetuneManager` owns the four flax heads
and their training loop (warmup + plateau LR halving + early stop, a
single `lax.scan` per epoch on device).

This notebook finetunes the RT head on a synthetic-but-physics-grounded
peptide corpus and shows the held-out improvement."""),
    ("code", _SETUP),
    ("code", """\
from alphadia_tpu.models.finetune import FinetuneManager
from alphadia_tpu.testing.physics import PeptidePhysics

rng = np.random.default_rng(3)
physics = PeptidePhysics(seed=11)
AA = np.array(list("ACDEFGHIKLMNPQRSTVWY"))
seqs = [
    "".join(rng.choice(AA, size=rng.integers(7, 24))) + ("K" if rng.random() < 0.5 else "R")
    for _ in range(800)
]
rt_norm = physics.rt_norm(seqs)  # ground truth this world assigns
df = pd.DataFrame({"sequence": seqs, "mods": "", "mod_sites": "", "rt_norm": rt_norm})
df.head()"""),
    ("code", """\
mgr = FinetuneManager({"epochs": 30, "batch_size": 256}, random_state=0)
metrics = mgr.finetune_rt(df)
print({k: round(v, 4) for k, v in metrics.items() if isinstance(v, (int, float))})
assert metrics["r2"] > 0.7"""),
    ("code", """\
# held-out check on fresh sequences from the same world
test_seqs = [
    "".join(rng.choice(AA, size=rng.integers(7, 24))) + "K" for _ in range(200)
]
pred = mgr.predict_rt(test_seqs)
truth = physics.rt_norm(test_seqs)
r2 = 1 - np.sum((pred - truth) ** 2) / np.sum((truth - truth.mean()) ** 2)
print(f"held-out R^2 = {r2:.3f}")

fig, ax = plt.subplots(figsize=(5, 5))
ax.scatter(truth, pred, s=8, alpha=0.5)
ax.plot([0, 1], [0, 1], "k--", lw=1)
ax.set_xlabel("true rt_norm")
ax.set_ylabel("predicted rt_norm")
fig.tight_layout()"""),
    ("md", """\
In production this manager is driven by `SearchPlanOutput` after the
transfer step: the accumulated transfer library provides the PSMs, all
four heads are finetuned, and `search_plan.py` forwards the finetuned
weights into the library-prediction step of the next pass."""),
]


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    for name, cells in [
        ("loess", loess),
        ("calibration", calibration),
        ("optimization_simulation", optimization),
        ("protein_grouping_tutorial", grouping),
        ("finetuning", finetuning),
    ]:
        path = OUT / f"{name}.ipynb"
        nbf.write(_nb(cells), path)
        print("wrote", path)


if __name__ == "__main__":
    main()
