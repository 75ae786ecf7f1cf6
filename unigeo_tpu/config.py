"""YAML experiment-config system with reference schema parity.

The YAML schema matches the reference exactly (reference: configs/*.yaml,
configs/config_utils.py) so existing UniGeo experiment files work unchanged:

    dataset: "ScannetPPDataset"        # class name resolved in the registry
    root: "/path/to/data"
    h: 384
    w: 512
    clip_length: 25
    clip_overlap: 5
    split: "test"
    model_name: "DepthCrafter"
    model_params: {...}                # forwarded to the model constructor
    eval_depth:
      metric_names: [...]
      depth_alignment: "lstsq"
    eval_normal: {metric_names: [...]}
    eval_pcd: {metric_names: [...], pcd_downsample_num: 10000}
    eval_camera: {metric_names: [...]}
    vis_depth: true
    vis_pcd: true

One deliberate behavior fix over the reference: ``depth_alignment`` from the
YAML is honored (the reference reads it but hardcodes lstsq — eval.py:48-49).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import yaml


def load_config(path: str) -> Dict[str, Any]:
    with open(path, "r") as f:
        return yaml.safe_load(f)


def parse_dataset_config(config: Dict[str, Any]) -> Dict[str, Any]:
    """Project dataset kwargs from a full experiment config.

    Defaults mirror the reference: clip_length=30, clip_overlap=0
    (reference: configs/config_utils.py:9-19).
    """
    out = {
        "root": config.get("root"),
        "clip_length": config.get("clip_length", 30),
        "clip_overlap": config.get("clip_overlap", 0),
        "input_size": (config["h"], config["w"]),
        "target_size": (config["h"], config["w"]),
    }
    if "split" in config:
        out["split"] = config["split"]
    # extension over the reference schema: loader-specific kwargs (e.g.
    # sintel pass_name, interiornet intrinsics) pass through verbatim
    out.update(config.get("dataset_params") or {})
    return out


_METRIC_SECTIONS = ("eval_depth", "eval_pcd", "eval_camera", "eval_normal")


def parse_metric_config(config: Dict[str, Any]) -> List[str]:
    """Collect metric column names from the eval_* sections.

    (reference: configs/config_utils.py:22-35; sections double as feature
    gates, eval.py:47,53,66,86)
    """
    metric_names: List[str] = []
    for section in ("eval_depth", "eval_pcd", "eval_camera", "eval_normal"):
        if section in config:
            metric_names.extend(config[section]["metric_names"])
    return metric_names


_ALIGNMENT_MODES = ("lstsq", "median", "lad", "lad2", "scale", "metric")


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Typed view over an experiment config used by the eval driver."""

    dataset: str
    model_name: str
    dataset_kwargs: Dict[str, Any]
    model_params: Dict[str, Any]
    metric_names: List[str]
    eval_depth: bool
    eval_normal: bool
    eval_pcd: bool
    eval_camera: bool
    depth_alignment: str = "lstsq"
    pcd_downsample_num: int = -1
    vis_depth: bool = False
    vis_pcd: bool = False
    max_depth: float = 80.0
    raw: Optional[Dict[str, Any]] = None

    @classmethod
    def from_dict(cls, config: Dict[str, Any]) -> "EvalConfig":
        depth_alignment = "lstsq"
        if "eval_depth" in config:
            depth_alignment = config["eval_depth"].get("depth_alignment", "lstsq")
            if depth_alignment not in _ALIGNMENT_MODES:
                raise ValueError(
                    f"unknown depth_alignment {depth_alignment!r}; "
                    f"expected one of {_ALIGNMENT_MODES}"
                )
        return cls(
            dataset=config["dataset"],
            model_name=config["model_name"],
            dataset_kwargs=parse_dataset_config(config),
            model_params=config.get("model_params") or {},
            metric_names=parse_metric_config(config),
            eval_depth="eval_depth" in config,
            eval_normal="eval_normal" in config,
            eval_pcd="eval_pcd" in config,
            eval_camera="eval_camera" in config,
            depth_alignment=depth_alignment,
            pcd_downsample_num=(
                config["eval_pcd"].get("pcd_downsample_num", -1)
                if "eval_pcd" in config
                else -1
            ),
            vis_depth=bool(config.get("vis_depth", False)),
            vis_pcd=bool(config.get("vis_pcd", False)),
            max_depth=float(
                (config.get("eval_depth") or {}).get(
                    "max_depth", config.get("max_depth", 80.0)
                )
            ),
            raw=config,
        )

    @classmethod
    def from_yaml(cls, path: str) -> "EvalConfig":
        return cls.from_dict(load_config(path))
