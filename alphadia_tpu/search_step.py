"""Single search step: config merge, library build/load, per-file loop.

(reference: alphadia/search_step.py — same responsibilities: layered
config merge (default < user < cli < multistep extra, frozen_config.yaml
snapshot), library build via the libtransform pipeline, per-raw-file loop
with ``reuse_quant`` skip + error collection + ``fail_fast``, per-run
``psm.parquet``/``frag.parquet``, then SearchPlanOutput aggregation.)
"""

from __future__ import annotations

import traceback
from pathlib import Path

import numpy as np

from alphadia_tpu.config import load_default_config
from alphadia_tpu.constants.keys import SearchStepFiles
from alphadia_tpu.exceptions import CustomError, NoLibraryAvailableError
from alphadia_tpu.library.decoy import DecoyGenerator
from alphadia_tpu.library.flatten import (
    FlattenLibrary,
    InitFlatColumns,
    LogFlatLibraryStats,
)
from alphadia_tpu.library.harmonize import (
    AnnotateFasta,
    IsotopeGenerator,
    PrecursorInitializer,
    RTNormalization,
)
from alphadia_tpu.library.loader import DynamicLoader
from alphadia_tpu.library.pipeline import ProcessingPipeline
from alphadia_tpu.library.speclib import SpecLibFlat
from alphadia_tpu.outputs.search_plan_output import SearchPlanOutput
from alphadia_tpu.reporting import init_logging, logger
from alphadia_tpu.workflow.base import QUANT_FOLDER_NAME
from alphadia_tpu.workflow.peptidecentric.peptidecentric import PeptideCentricWorkflow


class SearchStep:
    def __init__(
        self,
        output_folder: str,
        config: dict | None = None,
        cli_config: dict | None = None,
        extra_config: dict | None = None,
    ):
        self.output_folder = Path(output_folder)
        self.output_folder.mkdir(parents=True, exist_ok=True)

        self.config = load_default_config()
        self.config.update_layers(
            [
                ("user", config or {}),
                ("cli", cli_config or {}),
                ("multistep", extra_config or {}),
            ]
        )
        init_logging(
            self.output_folder,
            log_level=self.config["general"]["log_level"],
        )
        if not self.config["output_directory"]:
            self.config["output_directory"] = str(self.output_folder)
        self.config.to_yaml(self.output_folder / "frozen_config.yaml")

        # user-defined modifications (multiplex decoy channels etc.)
        from alphadia_tpu.library import chem

        for mod in self.config["custom_modifications"] or []:
            try:
                chem.register_custom_modification(mod["name"], mod["composition"])
            except Exception as e:
                logger.warning(f"custom modification {mod.get('name')}: {e}")

        seed = self.config["general"]["random_state"]
        if seed == -1:
            seed = int(np.random.default_rng().integers(0, 2**31))
            logger.info(f"Generated random state {seed}")
        self._np_rng = np.random.default_rng(seed)

        self.spectral_library: SpecLibFlat | None = None
        self.errors: list[tuple[str, str]] = []

    def load_library(self) -> SpecLibFlat:
        """Build or load the spectral library.

        (reference: search_step.py:257-393 — digest/predict when no library,
        then harmonize + decoy + flatten pipelines.)
        """
        lib_path = self.config["library_path"]
        fasta_paths = list(self.config["fasta_paths"] or [])
        predict = self.config["library_prediction"]["enabled"]

        if lib_path:
            lib = DynamicLoader()(lib_path)
        elif fasta_paths and predict:
            from alphadia_tpu.library.digest import digest_fasta

            lp = self.config["library_prediction"]
            lib = digest_fasta(
                fasta_paths,
                enzyme=lp["enzyme"],
                missed_cleavages=lp["missed_cleavages"],
                fixed_modifications=lp["fixed_modifications"],
                variable_modifications=lp["variable_modifications"],
                max_var_mod_num=lp["max_var_mod_num"],
                precursor_len=tuple(lp["precursor_len"]),
                precursor_charge=tuple(lp["precursor_charge"]),
                precursor_mz=tuple(lp["precursor_mz"]),
            )
        else:
            raise NoLibraryAvailableError()

        if isinstance(lib, SpecLibFlat):
            logger.info("Flat library loaded as-is")
            # decoy-free flat input (e.g. an MBR library saved with
            # fdr.keep_decoys_in_mbr_library=false): regenerate decoys,
            # matching the reference's regeneration at load
            from alphadia_tpu.library.decoy import generate_flat_decoys

            return generate_flat_decoys(lib)

        # harmonize
        harmonize_steps = [PrecursorInitializer(self.config["library_loading"]["drop_decoys"])]
        if fasta_paths and lib_path:
            harmonize_steps.append(AnnotateFasta(fasta_paths))
        if predict or lib.fragment_intensity_df is None or "rt" not in lib.precursor_df.columns:
            from alphadia_tpu.models.prediction import SimplePrediction

            lp = self.config["library_prediction"]
            harmonize_steps.append(
                SimplePrediction(
                    fragment_types=tuple(lp["fragment_types"]),
                    max_fragment_charge=lp["max_fragment_charge"],
                    model_path=lp["peptdeep_model_path"],
                    predict_charge=lp["predict_charge"],
                    min_charge_probability=lp["min_charge_probability"],
                    nce=lp["nce"],
                    instrument=lp["instrument"],
                    model_type=lp["peptdeep_model_type"],
                )
            )
        harmonize_steps += [IsotopeGenerator(), RTNormalization()]
        lib = ProcessingPipeline(harmonize_steps)(lib)

        if self.config["library_multiplexing"]["enabled"]:
            from alphadia_tpu.library.multiplex import MultiplexLibrary

            lib = MultiplexLibrary(
                self.config["library_multiplexing"]["multiplex_mapping"],
                self.config["library_multiplexing"]["input_channel"],
            )(lib)

        # decoys + flatten
        lib = DecoyGenerator("diann")(lib)
        if self.config["general"]["save_library"]:
            lib.save_hdf(self.output_folder / "speclib.hdf")
        flat = ProcessingPipeline(
            [
                FlattenLibrary(
                    self.config["search"]["top_k_fragments_scoring"],
                    self.config["search"]["min_fragment_intensity"],
                ),
                InitFlatColumns(),
                LogFlatLibraryStats(),
            ]
        )(lib)
        if self.config["general"]["save_flat_library"]:
            flat.save_hdf(self.output_folder / "speclib.flat.hdf")
        return flat

    # ------------------------------------------------------------------
    def run(self) -> None:
        # multi-host wiring must happen before ANY jax computation —
        # library prediction below already runs the models, after which
        # jax.distributed.initialize refuses to start
        from alphadia_tpu.parallel.distributed import (
            initialize_distributed,
            shard_files_for_host,
        )

        is_distributed = initialize_distributed()

        self.spectral_library = self.load_library()

        quant_dir = Path(
            self.config["quant_directory"]
            or self.output_folder / QUANT_FOLDER_NAME
        )
        all_files = list(self.config["raw_paths"] or [])
        my_files = shard_files_for_host(all_files) if is_distributed else all_files
        if is_distributed:
            logger.log(
                25,
                f"distributed: this host searches {len(my_files)}/{len(all_files)} files",
            )
        fail_fast_error: BaseException | None = None
        for raw_path in my_files:
            raw_name = Path(raw_path).stem
            run_folder = quant_dir / raw_name

            psm_path = run_folder / SearchStepFiles.PSM_FILE_NAME
            if self.config["general"]["reuse_quant"] and psm_path.exists():
                logger.log(25, f"Reusing quant for {raw_name}")
                continue

            try:
                self._process_raw_file(raw_path, raw_name, quant_dir)
            except CustomError as e:
                self.errors.append((raw_name, e.error_code))
                logger.error(f"{raw_name}: {e.error_code}: {e}")
                if self.config["general"]["fail_fast"]:
                    fail_fast_error = e
            except Exception as e:
                self.errors.append((raw_name, str(e)))
                logger.error(f"{raw_name} failed: {e}\n{traceback.format_exc()}")
                if self.config["general"]["fail_fast"]:
                    fail_fast_error = e
            if fail_fast_error is not None:
                # in a multi-host job this host must still participate in
                # the barriers below or every peer hangs there; the error
                # re-raises after the collective bookkeeping completes
                logger.error("fail_fast: skipping remaining raw files")
                break
        if fail_fast_error is not None and not is_distributed:
            raise fail_fast_error

        # cross-run aggregation covers EVERY run (all hosts' quant
        # folders on the shared filesystem), and exactly one host builds
        # it — concurrent builders would race on the same output tables
        folder_list = [quant_dir / Path(p).stem for p in all_files]
        if is_distributed:
            import jax
            from jax.experimental import multihost_utils

            # barrier: aggregation must not start before every host has
            # finished writing its per-run quant artifacts
            multihost_utils.sync_global_devices("alphadia_tpu_quant_done")
            if jax.process_index() != 0:
                logger.log(25, "distributed: aggregation runs on process 0")
                # wait for the builder so every host leaves run() with the
                # step artifacts (stat.tsv, MBR/transfer libraries) on
                # disk — multistep plans read them right after
                multihost_utils.sync_global_devices("alphadia_tpu_output_done")
                if fail_fast_error is not None:
                    raise fail_fast_error
                return

        try:
            output = SearchPlanOutput(self.config, self.output_folder)
            output.build(folder_list, self.spectral_library)
        finally:
            if is_distributed:
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices("alphadia_tpu_output_done")
        if fail_fast_error is not None:
            raise fail_fast_error

    # ------------------------------------------------------------------
    def _process_raw_file(self, raw_path: str, raw_name: str, quant_dir: Path) -> None:
        per_file_seed = (
            int(self._np_rng.integers(0, 2**31))
            if self.config["general"]["random_state"] is not None
            else None
        )
        workflow = PeptideCentricWorkflow(
            raw_name,
            self.config,
            quant_path=str(quant_dir),
            random_state=per_file_seed,
        )
        profile_dir = self.config["general"].get("profile_directory")
        from alphadia_tpu.utils.profiling import profile_trace

        with profile_trace(
            str(Path(profile_dir) / raw_name) if profile_dir else None
        ):
            workflow.load(raw_path, self.spectral_library.copy())
            workflow.search_parameter_optimization()
            psm_df, frag_df = workflow.extraction()

        psm_df.to_parquet(workflow.path / SearchStepFiles.PSM_FILE_NAME, index=False)
        frag_df.to_parquet(workflow.path / SearchStepFiles.FRAG_FILE_NAME, index=False)
        if self.config["transfer_library"]["enabled"]:
            # re-quantify the full transfer fragment space for confident PSMs
            # (reference requantify_fragments, peptidecentric.py:296-317)
            try:
                _, frag_transfer_df = workflow.requantify_fragments(psm_df)
                if len(frag_transfer_df) < len(frag_df):
                    # sequence-derived fragment space didn't match the data
                    # (e.g. libraries whose fragment m/z are not computable
                    # from the sequence column) — the scored set is richer
                    logger.warning(
                        "transfer requantification matched fewer fragments "
                        f"({len(frag_transfer_df)}) than the scored set "
                        f"({len(frag_df)}); keeping the scored set"
                    )
                    frag_transfer_df = frag_df
            except Exception as e:  # degraded fallback: scored top-k set
                logger.warning(
                    f"transfer requantification failed ({e}); "
                    "falling back to the scored fragment set"
                )
                frag_transfer_df = frag_df
            frag_transfer_df.to_parquet(
                workflow.path / SearchStepFiles.FRAG_TRANSFER_FILE_NAME, index=False
            )
        workflow.dia_data.free_device()
