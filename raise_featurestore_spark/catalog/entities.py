"""Catalog entities: Organization → Domain → Project → FeatureGroup → Feature.

Metadata plane re-implementation of the reference's namespace hierarchy
(reference: raise_/models/organization.py:20, domain.py:23, project.py:23,
feature_group.py:36-101, feature.py:23-84; ERD raise_/PRD.md:165-187).

Spark mapping (SURVEY §1.1): a FeatureGroup binds to one physical table
(parquet/Delta directory); a Feature is a column; feature *versions* are
version-suffixed physical columns (``name`` = v1, ``name__v{n}`` for later
versions) with bare-name reads resolving to the latest active version.
Derived features are virtual (computed at read) until materialized by a job.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from enum import Enum
from typing import Any

from raise_featurestore_spark.catalog.acl import ACL, ExternalGrant
from raise_featurestore_spark.types import FeatureType, parse_dtype


class FeatureStatus(str, Enum):
    ACTIVE = "active"
    DEPRECATED = "deprecated"
    ARCHIVED = "archived"


@dataclass
class Feature:
    """A typed, versioned column (reference: feature.py:23-84)."""

    name: str
    dtype: FeatureType
    version: int = 1
    description: str = ""
    derived_from: str | None = None  # expression over other features
    nullable: bool = True
    default: Any = None
    tags: dict[str, str] = field(default_factory=dict)
    status: FeatureStatus = FeatureStatus.ACTIVE
    created_at: float = field(default_factory=time.time)

    @property
    def is_derived(self) -> bool:
        return self.derived_from is not None

    @property
    def physical_column(self) -> str:
        """Physical column name: v1 keeps the bare name; later versions get
        a __v{n} suffix (schemas are immutable per version,
        reference: PRD.md:630-641)."""
        return self.name if self.version == 1 else f"{self.name}__v{self.version}"

    @property
    def versioned_name(self) -> str:
        return f"{self.name}@v{self.version}"

    def deprecate(self) -> None:
        self.status = FeatureStatus.DEPRECATED

    def archive(self) -> None:
        self.status = FeatureStatus.ARCHIVED

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "dtype": str(self.dtype),
            "version": self.version,
            "description": self.description,
            "derived_from": self.derived_from,
            "nullable": self.nullable,
            "default": self.default,
            "tags": dict(self.tags),
            "status": self.status.value,
            "created_at": self.created_at,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Feature":
        return cls(
            name=d["name"],
            dtype=parse_dtype(d["dtype"]),
            version=d.get("version", 1),
            description=d.get("description", ""),
            derived_from=d.get("derived_from"),
            nullable=d.get("nullable", True),
            default=d.get("default"),
            tags=d.get("tags", {}),
            status=FeatureStatus(d.get("status", "active")),
            created_at=d.get("created_at", 0.0),
        )


@dataclass
class FeatureGroupMeta:
    """Metadata record of a feature group (reference: feature_group.py:36-101)."""

    name: str
    entity_key: str
    entity_dtype: FeatureType
    description: str = ""
    tags: dict[str, str] = field(default_factory=dict)
    # name → list of versions ascending (reference: feature_group.py:85)
    features: dict[str, list[Feature]] = field(default_factory=dict)
    storage_path: str | None = None
    created_at: float = field(default_factory=time.time)
    # cross-org grants (reference: feature_group.py:529-579); list of
    # catalog.acl.ExternalGrant
    grants: list = field(default_factory=list)
    # same-org role ACL (reference: feature_group.py:509-527); catalog.acl.ACL
    acl: "ACL" = field(default_factory=lambda: ACL())

    def latest(self, name: str) -> Feature:
        versions = self.features.get(name)
        if not versions:
            raise KeyError(f"unknown feature {name!r}")
        active = [f for f in versions if f.status == FeatureStatus.ACTIVE]
        return (active or versions)[-1]

    def get_version(self, name: str, version: int) -> Feature:
        for f in self.features.get(name, []):
            if f.version == version:
                return f
        raise KeyError(f"unknown feature {name}@v{version}")

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "entity_key": self.entity_key,
            "entity_dtype": str(self.entity_dtype),
            "description": self.description,
            "tags": dict(self.tags),
            "features": {n: [f.to_dict() for f in vs] for n, vs in self.features.items()},
            "storage_path": self.storage_path,
            "created_at": self.created_at,
            "grants": [
                {
                    "grantee_org": g.grantee_org,
                    "features": list(g.features),
                    "role": g.role,
                    "expires_at": g.expires_at,
                }
                for g in self.grants
            ],
            "acl": {
                "readers": sorted(self.acl.readers),
                "writers": sorted(self.acl.writers),
                "admins": sorted(self.acl.admins),
            },
        }

    @classmethod
    def from_dict(cls, d: dict) -> "FeatureGroupMeta":
        return cls(
            name=d["name"],
            entity_key=d["entity_key"],
            entity_dtype=parse_dtype(d["entity_dtype"]),
            description=d.get("description", ""),
            tags=d.get("tags", {}),
            features={
                n: [Feature.from_dict(f) for f in vs] for n, vs in d.get("features", {}).items()
            },
            storage_path=d.get("storage_path"),
            created_at=d.get("created_at", 0.0),
            grants=[
                ExternalGrant(
                    grantee_org=g["grantee_org"],
                    features=g.get("features", ["*"]),
                    role=g.get("role", "reader"),
                    expires_at=g.get("expires_at"),
                )
                for g in d.get("grants", [])
            ],
            acl=ACL(
                readers=set(d.get("acl", {}).get("readers", [])),
                writers=set(d.get("acl", {}).get("writers", [])),
                admins=set(d.get("acl", {}).get("admins", [])),
            ),
        )


# FeatureGroup (the bound, Spark-aware object) lives in store.py; this alias
# keeps the public name importable from catalog.entities.
FeatureGroup = FeatureGroupMeta
