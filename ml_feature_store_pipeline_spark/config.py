"""Feature/metadata config objects and YAML config I/O.

Mirrors the reference's Pydantic models `FeatureConfig` (`ML Feature Store
Pipeline.py:27-39`), `FeatureMetadata` (`:41-48`) and `DataQualityMetrics`
(`:50-56`), and the YAML config sink/source (`:544-566, :616-617`). Plain
dataclasses — no external deps — with the same dtype whitelist validation
the reference enforces at `:34-39`.
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict
from typing import Any

from .schemas import SUPPORTED_DTYPES


@dataclass
class FeatureConfig:
    """One feature column's declaration (reference `:27-39`)."""

    name: str
    dtype: str
    description: str = ""
    tags: list[str] = field(default_factory=list)
    owner: str = "data-team"

    def __post_init__(self) -> None:
        if self.dtype not in SUPPORTED_DTYPES:
            raise ValueError(f"dtype must be one of {SUPPORTED_DTYPES}, got {self.dtype!r}")

    def to_dict(self) -> dict[str, Any]:
        return asdict(self)


@dataclass
class DataQualityMetrics:
    """Quality summary for a registered version (reference `:50-56`)."""

    null_percentage: float = 0.0
    duplicate_percentage: float = 0.0
    outlier_percentage: float = 0.0
    schema_violations: int = 0
    overall_score: float = 1.0

    def to_dict(self) -> dict[str, Any]:
        return asdict(self)


@dataclass
class FeatureMetadata:
    """Per-version metadata row (reference `:41-48`)."""

    feature_version: str = ""
    description: str = ""
    created_at: str = ""
    features_config: list[FeatureConfig] = field(default_factory=list)
    data_quality_metrics: DataQualityMetrics | None = None
    lineage: dict[str, str] = field(default_factory=dict)
    tags: list[str] = field(default_factory=list)

    def to_dict(self) -> dict[str, Any]:
        return {
            "feature_version": self.feature_version,
            "description": self.description,
            "created_at": self.created_at,
            "features_config": [c.to_dict() for c in self.features_config],
            "data_quality_metrics": (self.data_quality_metrics or DataQualityMetrics()).to_dict(),
            "lineage": dict(self.lineage),
            "tags": list(self.tags),
        }


#: Default config the reference writes as YAML (`:545-560`). Note the
#: reference never reads cache_ttl / data_quality_threshold back (SURVEY
#: §2.K dead-code note) — we DO honor them in FeatureStore.
DEFAULT_CONFIG: dict[str, Any] = {
    "database_path": "feature_store",
    "cache_ttl": 3600,
    "data_quality_threshold": 0.8,
    "retention_keep_n": 5,
    "monitoring": {"enabled": True, "alert_threshold": 0.8},
}


def create_advanced_config(path: str) -> str:
    """Write the default config file (reference K8 `:544-566`).

    Uses YAML if available, else JSON with a .yaml-compatible layout —
    the loader accepts both.
    """
    try:
        import yaml

        with open(path, "w") as f:
            yaml.safe_dump(DEFAULT_CONFIG, f)
    except ImportError:
        import json

        with open(path, "w") as f:
            json.dump(DEFAULT_CONFIG, f, indent=2)
    return path


def load_config(path: str) -> dict[str, Any]:
    """Load a config file written by :func:`create_advanced_config` (`:616-617`)."""
    with open(path) as f:
        text = f.read()
    try:
        import yaml

        return dict(DEFAULT_CONFIG, **(yaml.safe_load(text) or {}))
    except ImportError:
        import json

        return dict(DEFAULT_CONFIG, **json.loads(text))
