"""``stamp`` CLI — same subcommands and config file as the reference
(src/stamp/__main__.py): init, config, preprocess, encode_slides,
encode_patients, train, crossval, deploy, statistics, heatmaps.

Commands are table-driven: one ``_Command`` descriptor per subcommand names
its config section, its device field (for CPU platform pinning), and a
runner with a deferred import — so ``stamp init`` / ``--help`` stay instant
(no jax import cost).
"""

import argparse
import logging
import os
import shutil
import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Callable

import yaml

# Persistent XLA compilation cache: extraction backbones compile once per
# (model, batch shape) ever, not once per run.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path.home() / ".cache" / "jax_compilation_cache"),
)

STAMP_FACTORY_SETTINGS = Path(__file__).with_name("config.yaml")

_logger = logging.getLogger("stamp")
_logger.setLevel(logging.DEBUG)
_formatter = logging.Formatter("%(asctime)s\t%(levelname)s\t%(message)s")

_stream_handler = logging.StreamHandler(sys.stderr)
_stream_handler.setLevel(logging.INFO)
_stream_handler.setFormatter(_formatter)
_logger.addHandler(_stream_handler)


def _create_config_file(config_file: Path) -> None:
    if not config_file.exists():
        shutil.copy(STAMP_FACTORY_SETTINGS, config_file)
        _logger.info(f"Created new config file at {config_file.absolute()}")
    else:
        _logger.info(
            f"Refusing to overwrite existing config file at {config_file.absolute()}"
        )


def _add_file_handle_(logger: logging.Logger, *, output_dir: Path) -> None:
    output_dir.mkdir(exist_ok=True, parents=True)
    file_handler = logging.FileHandler(output_dir / "logfile.log")
    file_handler.setLevel(logging.DEBUG)
    file_handler.setFormatter(
        logging.Formatter("%(asctime)s\t%(levelname)s\t%(message)s")
    )
    logger.addHandler(file_handler)


# ---------------------------------------------------------------------------
# Command runners (imports deferred into each body)
# ---------------------------------------------------------------------------


def _run_preprocess(config: Any, section: Any) -> None:
    from stamp_tpu.preprocessing.extract import extract_

    extract_(
        output_dir=section.output_dir,
        wsi_dir=section.wsi_dir,
        wsi_list=section.wsi_list,
        cache_dir=section.cache_dir,
        tile_size_um=section.tile_size_um,
        tile_size_px=section.tile_size_px,
        extractor=section.extractor,
        max_workers=section.max_workers,
        device=section.device,
        default_slide_mpp=section.default_slide_mpp,
        brightness_cutoff=section.brightness_cutoff,
        canny_cutoff=section.canny_cutoff,
        cache_tiles_ext=section.cache_tiles_ext,
        generate_hash=section.generate_hash,
        macenko_normalization=section.macenko_normalization,
        # only an *explicit* YAML value pins the numeric mode; the default
        # leaves the STAMP_INT8_EXTRACTION env var in charge (config beats
        # environment, absence of config defers to it)
        extractor_precision=(
            section.extractor_precision
            if "extractor_precision" in section.model_fields_set
            else None
        ),
    )


def _run_encode_slides(config: Any, section: Any) -> None:
    from stamp_tpu.encoding.init import init_slide_encoder_

    init_slide_encoder_(
        encoder=section.encoder,
        output_dir=section.output_dir,
        feat_dir=section.feat_dir,
        device=section.device,
        agg_feat_dir=section.agg_feat_dir,
        generate_hash=section.generate_hash,
    )


def _run_encode_patients(config: Any, section: Any) -> None:
    from stamp_tpu.encoding.init import init_patient_encoder_

    init_patient_encoder_(
        encoder=section.encoder,
        output_dir=section.output_dir,
        feat_dir=section.feat_dir,
        slide_table_path=section.slide_table,
        patient_label=section.patient_label,
        filename_label=section.filename_label,
        device=section.device,
        agg_feat_dir=section.agg_feat_dir,
        generate_hash=section.generate_hash,
    )


def _run_train(config: Any, section: Any) -> None:
    from stamp_tpu.modeling.train import train_categorical_model_

    if section.task is None:
        raise ValueError("task must be set in training configuration")
    assert config.advanced_config is not None
    train_categorical_model_(config=section, advanced=config.advanced_config)


def _run_crossval(config: Any, section: Any) -> None:
    from stamp_tpu.modeling.crossval import categorical_crossval_

    if section.task is None:
        raise ValueError("task must be set in crossval configuration")
    assert config.advanced_config is not None
    categorical_crossval_(config=section, advanced=config.advanced_config)


def _run_deploy(config: Any, section: Any) -> None:
    from stamp_tpu.modeling.deploy import deploy_categorical_model_

    deploy_categorical_model_(
        output_dir=section.output_dir,
        checkpoint_paths=section.checkpoint_paths,
        clini_table=section.clini_table,
        slide_table=section.slide_table,
        feature_dir=section.feature_dir,
        patient_label=section.patient_label,
        filename_label=section.filename_label,
        drop_patients_with_missing_ground_truth=(
            section.drop_patients_with_missing_ground_truth
        ),
        num_workers=section.num_workers,
        accelerator=section.accelerator,
        ground_truth_label=section.ground_truth_label,
        time_label=section.time_label,
        status_label=section.status_label,
    )


def _run_statistics(config: Any, section: Any) -> None:
    from stamp_tpu.statistics import compute_stats_

    compute_stats_(
        task=section.task,
        output_dir=section.output_dir,
        pred_csvs=section.pred_csvs,
        ground_truth_label=section.ground_truth_label,
        true_class=section.true_class,
        time_label=section.time_label,
        status_label=section.status_label,
    )


def _run_heatmaps(config: Any, section: Any) -> None:
    from stamp_tpu.heatmaps.generate import heatmaps_

    heatmaps_(
        feature_dir=section.feature_dir,
        wsi_dir=section.wsi_dir,
        checkpoint_path=section.checkpoint_path,
        output_dir=section.output_dir,
        slide_paths=section.slide_paths,
        device=section.device,
        topk=section.topk,
        bottomk=section.bottomk,
        default_slide_mpp=section.default_slide_mpp,
        opacity=section.opacity,
    )


def _run_export_ckpt(src: Path, dst: Path) -> None:
    """Convert between the npz checkpoint and the reference's Lightning
    format, whichever direction the source file calls for."""
    from stamp_tpu.modeling.checkpoint import save_checkpoint
    from stamp_tpu.modeling.interop import (
        export_reference_checkpoint,
        is_reference_checkpoint,
        load_reference_checkpoint,
    )

    if is_reference_checkpoint(src):
        model, variables = load_reference_checkpoint(src)
        save_checkpoint(
            dst, hyper_parameters=model.checkpoint_hparams(), variables=variables
        )
        _logger.info(f"converted reference Lightning checkpoint {src} -> npz {dst}")
    else:
        export_reference_checkpoint(src, dst)
        _logger.info(f"converted npz checkpoint {src} -> reference Lightning {dst}")


@dataclass(frozen=True)
class _Command:
    help: str
    section: str | None = None  # StampConfig attribute holding the sub-config
    section_noun: str | None = None  # for the "no … configuration supplied" error
    device_field: str | None = None  # section attribute naming the device
    needs_advanced: bool = False  # default AdvancedConfig if absent
    run: Callable[[Any, Any], None] | None = None


_COMMANDS: dict[str, _Command] = {
    "init": _Command(
        help="Create a new STAMP configuration file at the path specified by --config",
    ),
    "preprocess": _Command(
        help="Preprocess whole-slide images into feature vectors",
        section="preprocessing",
        section_noun="preprocessing",
        device_field="device",
        run=_run_preprocess,
    ),
    "encode_slides": _Command(
        help="Encode patch-level features into slide-level embeddings",
        section="slide_encoding",
        section_noun="slide encoding",
        device_field="device",
        run=_run_encode_slides,
    ),
    "encode_patients": _Command(
        help="Encode features into patient-level embeddings",
        section="patient_encoding",
        section_noun="patient encoding",
        device_field="device",
        run=_run_encode_patients,
    ),
    "train": _Command(
        help="Train a Vision Transformer model",
        section="training",
        section_noun="training",
        needs_advanced=True,
        run=_run_train,
    ),
    "crossval": _Command(
        help="Train a Vision Transformer model with cross validation for "
        "modeling.n_splits folds",
        section="crossval",
        section_noun="crossval",
        needs_advanced=True,
        run=_run_crossval,
    ),
    "deploy": _Command(
        help="Deploy a trained Vision Transformer model",
        section="deployment",
        section_noun="deployment",
        device_field="accelerator",
        run=_run_deploy,
    ),
    "statistics": _Command(
        help="Generate AUROCs and AUPRCs with 95%%CI for a trained Vision "
        "Transformer model",
        section="statistics",
        section_noun="statistics",
        run=_run_statistics,
    ),
    "config": _Command(help="Print the loaded configuration"),
    "export_ckpt": _Command(
        help="Convert a model checkpoint between this framework's npz format "
        "and the reference's Lightning .ckpt (direction inferred from the "
        "source file; see modeling/interop.py)",
    ),
    "heatmaps": _Command(
        help="Generate heatmaps for a trained model",
        section="heatmaps",
        section_noun="heatmaps",
        device_field="device",
        run=_run_heatmaps,
    ),
}


def _requested_device(config: Any, command: _Command) -> str | None:
    """The device/accelerator the user asked this command to run on."""
    if command.needs_advanced:
        return getattr(config.advanced_config, "accelerator", None)
    if command.section and command.device_field:
        section = getattr(config, command.section, None)
        return getattr(section, command.device_field, None)
    return None


def _run_cli(args: argparse.Namespace) -> None:
    command = _COMMANDS[args.command]

    if args.command == "init":
        _create_config_file(args.config_file_path)
        return

    if args.command == "export_ckpt":
        _run_export_ckpt(args.src, args.dst)
        return

    from stamp_tpu.modeling.config import (
        AdvancedConfig,
        MlpModelParams,
        ModelParams,
        VitModelParams,
    )
    from stamp_tpu.utils.config import StampConfig
    from stamp_tpu.utils.seed import Seed

    with open(args.config_file_path, "r") as config_yaml:
        config = StampConfig.model_validate(yaml.safe_load(config_yaml))

    if command.needs_advanced and config.advanced_config is None:
        config.advanced_config = AdvancedConfig(
            model_params=ModelParams(vit=VitModelParams(), mlp=MlpModelParams()),
        )
    if config.advanced_config is not None and config.advanced_config.seed is not None:
        Seed.set(config.advanced_config.seed)

    # When the command is explicitly pinned to the CPU, fix the jax platform
    # before any backend initializes — skips the TPU claim entirely.
    if _requested_device(config, command) == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.command == "config":
        print(yaml.dump(config.model_dump(mode="json", exclude_none=True)))
        return

    assert command.section is not None and command.run is not None
    section = getattr(config, command.section)
    if section is None:
        raise ValueError(f"no {command.section_noun} configuration supplied")

    _add_file_handle_(_logger, output_dir=section.output_dir)
    _logger.info(
        "using the following configuration:\n"
        f"{yaml.dump(section.model_dump(mode='json', exclude_none=True))}"
    )
    if getattr(args, "profile", False):
        from stamp_tpu.utils.profiling import profiled_run

        with profiled_run(section.output_dir):
            command.run(config, section)
    else:
        command.run(config, section)


def main() -> None:
    parser = argparse.ArgumentParser(
        prog="stamp",
        description="STAMP-TPU: Solid Tumor Associative Modeling in Pathology "
        "(TPU-native)",
    )
    parser.add_argument(
        "--config",
        "-c",
        type=Path,
        dest="config_file_path",
        default=Path("config.yaml"),
        help="Path to config file. Default: config.yaml",
    )
    parser.add_argument(
        "--profile",
        action="store_true",
        help="Write a device trace (<output_dir>/profile, TensorBoard/xprof "
        "format) and log a per-stage wall-time table for the command.",
    )

    subparsers = parser.add_subparsers(dest="command")
    for name, command in _COMMANDS.items():
        sub = subparsers.add_parser(name, help=command.help)
        if name == "export_ckpt":
            sub.add_argument("src", type=Path, help="checkpoint to convert")
            sub.add_argument("dst", type=Path, help="output path")

    args = parser.parse_args()

    if args.command is None:
        parser.print_help()
        exit(1)

    try:
        _run_cli(args)
    except Exception as e:
        _logger.exception(e)
        exit(1)


if __name__ == "__main__":
    main()
