"""FeatureStore client: catalog CRUD + Spark-bound feature groups.

Re-implements the reference's entry-point client (reference:
raise_/client.py:40-206 — context, CRUD with if_exists, search_features
:502-552) and the bound feature-group surface (raise_/models/
feature_group.py:103-214 create_feature, :346-352 version access, :393-439
point lookup, :596-614 analyze).

The metadata store is a JSON-persisted registry (the reference's is
in-process dicts; its PRD targets PostgreSQL — either way it is
metadata-plane, not a Spark concern). The data plane is one parquet
directory per feature group under ``{root}/data/...``; derived features are
virtual columns compiled at read time by the expression compiler.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raise_featurestore_spark.catalog.audit import AuditLog
from raise_featurestore_spark.catalog.entities import Feature, FeatureGroupMeta, FeatureStatus
from raise_featurestore_spark.catalog.lineage import FeatureRef, LineageGraph
from raise_featurestore_spark.types import DTypeError, parse_dtype


class CatalogError(ValueError):
    pass


class AlreadyExistsError(CatalogError):
    pass


class NotFoundError(CatalogError):
    pass


@dataclass
class _Node:
    """One namespace level (org / domain / project)."""

    name: str
    description: str = ""
    children: dict[str, "_Node"] = field(default_factory=dict)
    groups: dict[str, FeatureGroupMeta] = field(default_factory=dict)
    created_at: float = field(default_factory=time.time)
    tags: list[str] = field(default_factory=list)
    # org-level audit retention/immutability settings (reference:
    # models/audit.py:256-285 AuditConfig; examples/05)
    audit_config: dict | None = None
    # namespace-level ACL, inherited downward (reference: acl.py:118-129)
    acl: "ACL" = None  # type: ignore[assignment]

    def __post_init__(self) -> None:
        if self.acl is None:
            from raise_featurestore_spark.catalog.acl import ACL

            self.acl = ACL()


class FeatureStore:
    """Catalog root + context holder (reference: client.py:40-161)."""

    def __init__(self, path: str, org: str | None = None, domain: str | None = None,
                 project: str | None = None):
        self.path = path
        self._orgs: dict[str, _Node] = {}
        self.lineage = LineageGraph()
        self.audit = AuditLog()
        self._jobs: dict = {}  # in-memory job registry (execution-plane)
        self._transforms = None  # lazy TransformsClient facade
        self._ctx = (org, domain, project)
        os.makedirs(path, exist_ok=True)
        self._load()

    @property
    def transforms(self):
        """Orchestrator facade (reference: client.py's ``fs.transforms``):
        ``fs.transforms.use_airflow(...).generate_definition(job)``."""
        if self._transforms is None:
            from raise_featurestore_spark.transforms.orchestrator import TransformsClient

            self._transforms = TransformsClient()
        return self._transforms

    # -- context ------------------------------------------------------------

    def with_context(self, org: str, domain: str | None = None, project: str | None = None
                     ) -> "FeatureStore":
        """Re-scoped view sharing the same registry (reference: client.py:137-161)."""
        fs = FeatureStore.__new__(FeatureStore)
        fs.path = self.path
        fs._orgs = self._orgs
        fs.lineage = self.lineage
        fs.audit = self.audit
        fs._jobs = self._jobs
        # force-instantiate so every context view shares ONE orchestrator
        # registry (a lazily-copied None would give each view its own)
        fs._transforms = self.transforms
        fs._ctx = (org, domain, project)
        return fs

    # -- namespace CRUD (if_exists: error|skip|update, reference: client.py:167-206)

    def create_organization(self, name: str, description: str = "", if_exists: str = "error"):
        return self._create(self._orgs, name, description, if_exists, "organization")

    def create_domain(self, org: str, name: str, description: str = "", if_exists: str = "error"):
        return self._create(self._org(org).children, name, description, if_exists, "domain")

    def create_project(self, org: str, domain: str, name: str, description: str = "",
                       if_exists: str = "error", tags: list[str] | None = None):
        node = self._org(org).children.get(domain)
        if node is None:
            raise NotFoundError(f"domain {org}/{domain} not found")
        proj = self._create(node.children, name, description, if_exists, "project")
        if tags:
            proj.tags = list(tags)
            self._save()
        return proj

    def _create(self, registry: dict, name: str, description: str, if_exists: str, kind: str):
        if name in registry:
            if if_exists == "error":
                raise AlreadyExistsError(f"{kind} {name!r} already exists")
            if if_exists == "skip":
                return registry[name]
            if if_exists == "update":
                registry[name].description = description
                return registry[name]
            raise CatalogError(f"invalid if_exists {if_exists!r}")
        registry[name] = _Node(name=name, description=description)
        self.audit.log("catalog", f"create_{kind}", name)
        self._save()
        return registry[name]

    def _org(self, name: str) -> _Node:
        if name not in self._orgs:
            raise NotFoundError(f"organization {name!r} not found")
        return self._orgs[name]

    def _project(self, org: str, domain: str, project: str) -> _Node:
        d = self._org(org).children.get(domain)
        if d is None:
            raise NotFoundError(f"domain {org}/{domain} not found")
        p = d.children.get(project)
        if p is None:
            raise NotFoundError(f"project {org}/{domain}/{project} not found")
        return p

    # -- feature groups -------------------------------------------------------

    def create_feature_group(
        self,
        name: str,
        entity_key: str,
        entity_dtype: str = "int64",
        description: str = "",
        org: str | None = None,
        domain: str | None = None,
        project: str | None = None,
        if_exists: str = "error",
        storage_path: str | None = None,
        tags: dict[str, str] | None = None,
    ) -> "BoundFeatureGroup":
        if if_exists not in ("error", "skip", "update"):
            raise ValueError(
                f"if_exists must be error|skip|update, got {if_exists!r}"
            )
        org, domain, project = self._resolve_ctx(org, domain, project)
        node = self._project(org, domain, project)
        if isinstance(tags, (list, tuple, set)):
            tags = {t: "" for t in tags}
        if name in node.groups:
            if if_exists == "error":
                raise AlreadyExistsError(f"feature group {name!r} already exists")
            if if_exists == "skip":
                return self.get_feature_group(name, org=org, domain=domain, project=project)
            # update: refresh the descriptive metadata IN PLACE — features,
            # versions, grants, and ACLs survive (a fresh meta here would
            # silently wipe them all). Immutable identity fields must MATCH
            # the stored group: silently returning the old group while
            # ignoring a different entity_key/storage_path would hand the
            # caller something other than what they asked for (ADVICE r4).
            # checked fields: entity_key is always caller-explicit (no
            # default); storage_path only when passed. entity_dtype is NOT
            # checked — its "int64" default is indistinguishable from
            # "unspecified", so a mismatch guard would false-positive on
            # every update of a string-keyed group.
            meta = node.groups[name]
            mismatches = {
                k: (got, want)
                for k, got, want in (
                    ("entity_key", entity_key, meta.entity_key),
                    ("storage_path", storage_path, meta.storage_path),
                )
                if got is not None and got != want
            }
            if mismatches:
                raise AlreadyExistsError(
                    f"feature group {name!r} exists with different immutable "
                    f"fields {sorted(mismatches)}: "
                    + "; ".join(
                        f"{k}: requested {g!r} != stored {w!r}"
                        for k, (g, w) in sorted(mismatches.items())
                    )
                    + " (drop and recreate to change them)"
                )
            meta.description = description or meta.description
            if tags:
                meta.tags.update(tags)
            self.audit.log(
                "catalog", "update_feature_group", f"{org}/{domain}/{project}/{name}"
            )
            self._save()
            return BoundFeatureGroup(self, org, domain, project, meta)
        meta = FeatureGroupMeta(
            name=name,
            entity_key=entity_key,
            entity_dtype=parse_dtype(entity_dtype),
            description=description,
            tags=tags or {},
            storage_path=storage_path
            or os.path.join(self.path, "data", org, domain, project, name),
        )
        node.groups[name] = meta
        self.audit.log("catalog", "create_feature_group", f"{org}/{domain}/{project}/{name}")
        self._save()
        return BoundFeatureGroup(self, org, domain, project, meta)

    def get_feature_group(self, name: str, org: str | None = None, domain: str | None = None,
                          project: str | None = None) -> "BoundFeatureGroup":
        org, domain, project = self._resolve_ctx(org, domain, project)
        node = self._project(org, domain, project)
        if name not in node.groups:
            raise NotFoundError(f"feature group {name!r} not found")
        return BoundFeatureGroup(self, org, domain, project, node.groups[name])

    def list_feature_groups(self, org: str | None = None, domain: str | None = None,
                            project: str | None = None) -> list[str]:
        org, domain, project = self._resolve_ctx(org, domain, project)
        return sorted(self._project(org, domain, project).groups)

    # -- path syntax + org handle (reference: client.py:214-262, examples/01) --

    def create_feature(self, path: str, dtype: str, **kwargs) -> Feature:
        """``"group/feature"`` path-syntax creation (reference: client.py:214)."""
        group_name, _, feat = path.partition("/")
        if not feat:
            raise CatalogError(f"expected 'group/feature', got {path!r}")
        return self.get_feature_group(group_name).create_feature(feat, dtype, **kwargs)

    def feature(self, path: str) -> Feature:
        """``"group/feature"`` or ``"group/feature@v2"`` retrieval."""
        group_name, _, feat = path.partition("/")
        if not feat:
            raise CatalogError(f"expected 'group/feature', got {path!r}")
        return self.get_feature_group(group_name).get_feature(feat)

    def organization(self, name: str) -> "OrganizationHandle":
        return OrganizationHandle(self, self._org(name))

    def domain(self, name: str, org: str | None = None) -> _Node:
        """Domain accessor (reference README:243 — ``fs.domain("x")``)."""
        org = org or self._ctx[0]
        if not org:
            raise CatalogError("no org context; pass org= or use with_context()")
        d = self._org(org).children.get(name)
        if d is None:
            raise NotFoundError(f"domain {org}/{name} not found")
        return d

    def project(self, name: str, org: str | None = None,
                domain: str | None = None) -> _Node:
        """Project accessor (reference README:247 — ``fs.project("x")``)."""
        org = org or self._ctx[0]
        domain = domain or self._ctx[1]
        if not (org and domain):
            raise CatalogError("no org/domain context; pass them or use with_context()")
        return self._project(org, domain, name)

    # -- namespace listings (reference: client.py:225-356) -------------------

    def list_organizations(self) -> list[str]:
        return sorted(self._orgs)

    def list_domains(self, org: str | None = None) -> list[str]:
        org = org or self._ctx[0]
        if not org:
            raise CatalogError("no org context; pass org or use with_context()")
        return sorted(self._org(org).children)

    def list_projects_in(self, org: str | None = None, domain: str | None = None) -> list[str]:
        org = org or self._ctx[0]
        domain = domain or self._ctx[1]
        if not (org and domain):
            raise CatalogError("no org/domain context; pass them or use with_context()")
        d = self._org(org).children.get(domain)
        if d is None:
            raise NotFoundError(f"domain {org}/{domain} not found")
        return sorted(d.children)

    def list_projects(self, tags: list[str] | None = None,
                      org: str | None = None, domain: str | None = None) -> list[str]:
        """Context-scoped project listing with optional tag filter
        (reference: client.py — ``fs.list_projects(tags=["ml"])``)."""
        org = org or self._ctx[0]
        domain = domain or self._ctx[1]
        if not (org and domain):
            raise CatalogError("no org/domain context; pass them or use with_context()")
        d = self._org(org).children.get(domain)
        if d is None:
            raise NotFoundError(f"domain {org}/{domain} not found")
        out = []
        for name, node in d.children.items():
            if tags and not set(tags) <= set(node.tags):
                continue
            out.append(name)
        return sorted(out)

    def create_job(self, name: str, sources=None, transform=None, target=None,
                   schedule=None, incremental=None, **kwargs):
        """Job factory on the store facade (reference: client.py:689):
        builds + deploys via ``fs.transforms`` and registers the job in
        the store's registry so get_job/list_jobs/deploy_job see it."""
        job = self.transforms.create_job(
            name, sources=sources, transform=transform, target=target,
            schedule=schedule, incremental=incremental, **kwargs,
        )
        self.register_job(job)
        return job

    def create_dashboard(self, name: str, description: str = ""):
        """Dashboard factory (reference: client.py:2195 README contract)."""
        from raise_featurestore_spark.analytics.dashboard import Dashboard

        dash = Dashboard(name=name)
        dash.description = description
        return dash

    # feature_group() is the reference's accessor name (client.py:400)
    def feature_group(self, name: str, **kwargs) -> "BoundFeatureGroup":
        return self.get_feature_group(name, **kwargs)

    def delete_feature_group(self, name: str, org: str | None = None,
                             domain: str | None = None, project: str | None = None) -> None:
        """Catalog delete (reference: feature_group.py:642-645). Metadata
        only — the storage path is left for the data-retention process."""
        org, domain, project = self._resolve_ctx(org, domain, project)
        node = self._project(org, domain, project)
        if name not in node.groups:
            raise NotFoundError(f"feature group {name!r} not found")
        del node.groups[name]
        self.audit.log("catalog", "delete_feature_group",
                       f"{org}/{domain}/{project}/{name}")
        self._save()

    def set_namespace_acl(self, acl, org: str, domain: str | None = None,
                          project: str | None = None) -> None:
        """Attach an ACL at org / domain / project level; groups inherit it
        through the merge cascade (reference: acl.py:118-129)."""
        node = self._org(org)
        if domain is not None:
            node = node.children.get(domain)
            if node is None:
                raise NotFoundError(f"domain {org}/{domain} not found")
        if project is not None:
            if domain is None:
                raise CatalogError("project ACL needs its domain")
            node = node.children.get(project)
            if node is None:
                raise NotFoundError(f"project {org}/{domain}/{project} not found")
        node.acl = acl
        self.audit.log("acl", "update_acl",
                       "/".join(x for x in (org, domain, project) if x))
        self._save()

    # -- job registry (reference: client.py:689-738; execution lives in
    # transforms.orchestrator — this is the client-side register/lookup
    # surface, shared across with_context views) ------------------------------

    def register_job(self, job) -> None:
        self._jobs[job.job_id] = job
        self.audit.log("catalog", "register_job", job.job_id)

    def get_job(self, job_id: str):
        if job_id not in self._jobs:
            raise NotFoundError(f"job {job_id!r} not found")
        return self._jobs[job_id]

    def list_jobs(self, status: str | None = None) -> list[str]:
        ids = sorted(self._jobs)
        if status:
            ids = [i for i in ids if str(self._jobs[i].status.value) == status]
        return ids

    def deploy_job(self, job_or_id) -> None:
        job = job_or_id if hasattr(job_or_id, "deploy") else self.get_job(job_or_id)
        if job.job_id not in self._jobs:
            self.register_job(job)
        job.deploy()
        self.audit.log("catalog", "deploy_job", job.job_id)

    def trigger_job(self, spark: SparkSession, job_or_id):
        job = job_or_id if hasattr(job_or_id, "run") else self.get_job(job_or_id)
        self.audit.log("data", "trigger_job", job.job_id)
        return job.run(spark)

    def _resolve_ctx(self, org, domain, project) -> tuple[str, str, str]:
        org = org or self._ctx[0]
        domain = domain or self._ctx[1]
        project = project or self._ctx[2]
        if not (org and domain and project):
            raise CatalogError("no org/domain/project context; use with_context() or pass them")
        return org, domain, project

    # -- search (reference: client.py:502-552) --------------------------------

    def search_features(self, query: str = "", dtype: str | None = None,
                        tags: dict[str, str] | None = None, limit: int = 100) -> list[dict]:
        out: list[dict] = []
        q = query.lower()
        for org_name, org in self._orgs.items():
            for dom_name, dom in org.children.items():
                for proj_name, proj in dom.children.items():
                    for g in proj.groups.values():
                        for versions in g.features.values():
                            for f in versions:
                                if q and q not in f.name.lower() and q not in f.description.lower():
                                    continue
                                if dtype and not _dtype_matches(str(f.dtype), dtype):
                                    continue
                                if tags and any(f.tags.get(k) != v for k, v in tags.items()):
                                    continue
                                out.append(
                                    {
                                        "qualified_name": f"{org_name}/{dom_name}/{proj_name}/"
                                        f"{g.name}/{f.versioned_name}",
                                        "dtype": str(f.dtype),
                                        "description": f.description,
                                        "tags": dict(f.tags),
                                    }
                                )
                                if len(out) >= limit:
                                    return out
        return out

    # -- persistence -----------------------------------------------------------

    def _save(self) -> None:
        def node_dict(n: _Node) -> dict:
            return {
                "name": n.name,
                "description": n.description,
                "children": {k: node_dict(v) for k, v in n.children.items()},
                "groups": {k: g.to_dict() for k, g in n.groups.items()},
                "tags": list(n.tags),
                "audit_config": n.audit_config,
                "acl": {
                    "readers": sorted(n.acl.readers),
                    "writers": sorted(n.acl.writers),
                    "admins": sorted(n.acl.admins),
                },
            }

        state = {
            "orgs": {k: node_dict(v) for k, v in self._orgs.items()},
            "lineage": {k: sorted(v) for k, v in self.lineage.upstream.items()},
        }
        with open(os.path.join(self.path, "catalog.json"), "w") as fh:
            json.dump(state, fh, indent=1, default=str)

    def _load(self) -> None:
        p = os.path.join(self.path, "catalog.json")
        if not os.path.exists(p):
            return
        with open(p) as fh:
            state = json.load(fh)

        def node_from(d: dict) -> _Node:
            n = _Node(name=d["name"], description=d.get("description", ""),
                      tags=list(d.get("tags", [])))
            n.children = {k: node_from(v) for k, v in d.get("children", {}).items()}
            n.groups = {k: FeatureGroupMeta.from_dict(v) for k, v in d.get("groups", {}).items()}
            n.audit_config = d.get("audit_config")
            from raise_featurestore_spark.catalog.acl import ACL

            a = d.get("acl", {})
            n.acl = ACL(readers=set(a.get("readers", [])),
                        writers=set(a.get("writers", [])),
                        admins=set(a.get("admins", [])))
            return n

        self._orgs = {k: node_from(v) for k, v in state.get("orgs", {}).items()}
        self.lineage.upstream = {k: set(v) for k, v in state.get("lineage", {}).items()}


class OrganizationHandle:
    """Org-scoped settings surface (reference: examples/05 audit config;
    models/audit.py:256-285)."""

    def __init__(self, store: FeatureStore, node: _Node):
        self.store = store
        self._node = node

    @property
    def name(self) -> str:
        return self._node.name

    def set_audit_config(self, retention_days: int = 365, immutable: bool = False,
                         export_destination: str | None = None):
        from raise_featurestore_spark.catalog.audit import AuditConfig

        cfg = AuditConfig(retention_days=retention_days, immutable=immutable,
                          export_destination=export_destination)
        self._node.audit_config = cfg.to_dict()
        self.store.audit.log("catalog", "set_audit_config", self._node.name)
        self.store._save()
        return cfg

    def get_audit_config(self):
        from raise_featurestore_spark.catalog.audit import AuditConfig

        return AuditConfig.from_dict(self._node.audit_config or {})


def _dtype_matches(actual: str, pattern: str) -> bool:
    """dtype wildcard match, e.g. ``float*`` or ``*[512]``."""
    import fnmatch

    return fnmatch.fnmatch(actual, pattern)


class BoundFeatureGroup:
    """A feature group bound to the store + a storage path; the Spark-aware
    surface (read/write/get/analyze/create_feature)."""

    def __init__(self, store: FeatureStore, org: str, domain: str, project: str,
                 meta: FeatureGroupMeta):
        self.store = store
        self.org, self.domain, self.project = org, domain, project
        self.meta = meta

    # -- feature CRUD (reference: feature_group.py:103-214) -------------------

    def create_feature(
        self,
        name: str,
        dtype: str,
        description: str = "",
        derived_from: str | None = None,
        nullable: bool = True,
        default: Any = None,
        tags: dict[str, str] | list[str] | None = None,
        if_exists: str = "error",
        validation_level: str = "standard",
    ) -> Feature:
        existing = self.meta.features.get(name, [])
        if existing and if_exists == "error":
            raise AlreadyExistsError(f"feature {name!r} exists (v{existing[-1].version})")
        if existing and if_exists == "skip":
            return existing[-1]
        # "update" (and any create on an existing name) = new immutable version
        version = existing[-1].version + 1 if existing else 1

        refs: list[FeatureRef] = []
        if derived_from is not None:
            from raise_featurestore_spark.expressions.validator import validate_expression

            known = set(self.meta.features) | {self.meta.entity_key}
            result = validate_expression(derived_from, known_features=known,
                                         level=validation_level)
            if not result.valid:
                from raise_featurestore_spark.expressions.compiler import ExpressionError

                raise ExpressionError(result)
            refs = result.references

        # the reference accepts both list-style and mapping tags
        if isinstance(tags, (list, tuple, set)):
            tags = {t: "" for t in tags}
        feature = Feature(
            name=name,
            dtype=parse_dtype(dtype),
            version=version,
            description=description,
            derived_from=derived_from,
            nullable=nullable,
            default=default,
            tags=tags or {},
        )
        qn = self.qualified_feature_name(feature)
        if derived_from is not None:
            ctx = FeatureRef(feature=name, group=self.meta.name, project=self.project,
                             domain=self.domain, org=self.org)
            dep_names = {r.qualified(ctx).split("@v")[0] for r in refs}
            self.store.lineage.add(qn.split("@v")[0], dep_names)
        self.meta.features.setdefault(name, []).append(feature)
        self.store.audit.log("catalog", "create_feature", qn)
        self.store._save()
        return feature

    def get_feature(self, name: str) -> Feature:
        """``name`` or ``name@v2`` (reference: feature_group.py:346-352)."""
        if "@v" in name:
            base, _, v = name.partition("@v")
            return self.meta.get_version(base, int(v))
        return self.meta.latest(name)

    # feature() is the reference's accessor name (feature_group.py:346)
    feature = get_feature

    def get_or_create_feature(self, name: str, dtype: str, **kwargs) -> Feature:
        """Idempotent creation (reference: feature_group.py:216-224)."""
        kwargs["if_exists"] = "skip"
        return self.create_feature(name, dtype, **kwargs)

    # -- bulk creation (reference: feature_group.py:226-344; examples/03) -----

    def create_features(self, specs: list[dict], if_exists: str = "error") -> list[Feature]:
        """Bulk creation from a list of spec dicts (name/dtype + any
        create_feature kwarg). Shapes and dtypes are validated up front so
        the common bad-spec cases fail before any feature is created;
        expression (derived_from) errors still surface per-feature since
        they need the group context of the features created before them."""
        for spec in specs:
            if "name" not in spec or "dtype" not in spec:
                raise CatalogError(f"feature spec needs name+dtype: {spec!r}")
            # parse eagerly so an invalid dtype fails BEFORE any feature is
            # created — the batch-atomicity the docstring promises
            parse_dtype(spec["dtype"])
        out: list[Feature] = []
        for spec in specs:
            s = dict(spec)
            out.append(
                self.create_feature(s.pop("name"), s.pop("dtype"), if_exists=if_exists, **s)
            )
        return out

    def create_features_from_schema(self, schema: dict[str, str],
                                    if_exists: str = "error") -> list[Feature]:
        """Bulk creation from a flat ``{name: dtype}`` mapping."""
        return self.create_features(
            [{"name": n, "dtype": d} for n, d in schema.items()], if_exists=if_exists
        )

    def create_features_from_file(self, path: str, if_exists: str = "error") -> list[Feature]:
        """Bulk creation from a YAML/JSON manifest with a top-level
        ``features:`` list (reference: feature_group.py:300-344)."""
        with open(path) as fh:
            text = fh.read()
        if path.endswith((".yaml", ".yml")):
            try:
                import yaml
            except ImportError as e:  # pragma: no cover - yaml is in the env
                raise CatalogError("pyyaml not available for YAML manifests") from e
            doc = yaml.safe_load(text)
        else:
            doc = json.loads(text)
        specs = doc.get("features", []) if isinstance(doc, dict) else doc
        return self.create_features(specs, if_exists=if_exists)

    def list_features(self, tags: list[str] | None = None) -> list[Feature]:
        """Latest active version of every feature, optionally tag-filtered."""
        feats = [self.meta.latest(n) for n in sorted(self.meta.features)]
        if tags:
            want = set(tags)
            feats = [f for f in feats if want & set(f.tags)]
        return feats

    def list_versions(self, name: str) -> list[Feature]:
        if name not in self.meta.features:
            raise NotFoundError(f"feature {name!r} not found")
        return list(self.meta.features[name])

    def feature_audit_log(self, name: str, **query_kwargs):
        """Audit entries scoped to one feature (reference: examples/05
        ``feature.audit_log`` — models/audit.py feature-level query)."""
        base = f"{self.org}/{self.domain}/{self.project}/{self.meta.name}/{name}"
        return self.store.audit.query(resource=f"{base}*", **query_kwargs)

    # -- same-org ACL (reference: feature_group.py:509-527) -------------------

    def set_acl(self, acl) -> None:
        self.meta.acl = acl
        self.store.audit.log("acl", "update_acl", self.qualified_name())
        self.store._save()

    def get_acl(self):
        return self.meta.acl

    def get_acl_chain(self) -> list:
        """org → domain → project → group ACLs (reference:
        feature_group.py:516-522)."""
        org = self.store._org(self.org)
        dom = org.children[self.domain]
        proj = dom.children[self.project]
        return [org.acl, dom.acl, proj.acl, self.meta.acl]

    def get_effective_acl(self):
        """Inheritance cascade: the group ACL merged with every ancestor
        level (reference: feature_group.py:509-514, acl.py:118-129)."""
        chain = self.get_acl_chain()
        eff = chain[-1]
        for parent in chain[:-1]:
            eff = eff.merge(parent)
        return eff

    def list_external_grants(self) -> list:
        return list(self.meta.grants)

    def create_live_table(self, name: str, analysis, refresh: str = "manual",
                          description: str = "", storage_path: str | None = None):
        """Materialized, auto-refreshable analysis over this group
        (reference: raise_/analytics/live_table.py:162-209 + README:918 —
        ``refresh`` is the policy mode: on_change/hourly/daily/weekly/
        manual). The compute closure re-reads the group so derived
        features resolve at refresh time."""
        import os as _os

        from raise_featurestore_spark.analytics.router import compile_analysis
        from raise_featurestore_spark.streaming.live_table import (
            LiveTable,
            RefreshPolicy,
        )

        path = storage_path or _os.path.join(
            self.store.path, "live", self.org, self.domain, self.project, name
        )
        lt = LiveTable(
            name=name,
            compute=lambda spark: compile_analysis(self.read(spark), analysis),
            storage_path=path,
            policy=RefreshPolicy(mode=refresh),
        )
        lt.description = description
        self.store.audit.log("catalog", "create_live_table",
                             f"{self.qualified_name()}/{name}")
        return lt

    def get_lineage(self, feature_name: str) -> "Lineage":
        """Lineage handle for one feature of this group (reference:
        raise_/models/feature.py:182, lineage.py:156-232):
        ``g.get_lineage("ctr").as_graph().to_ascii()``."""
        from raise_featurestore_spark.catalog.lineage import Lineage

        feat = self.get_feature(feature_name)  # raises if unknown
        qn = self.qualified_feature_name(feat).split("@v")[0]
        return Lineage(qn, self.store.lineage)

    def validate_feature(self, name: str, dtype: str,
                         derived_from: str | None = None, **kwargs):
        """Validate a definition without creating it (reference:
        feature_group.py:441-469). Returns the validator's result object."""
        from raise_featurestore_spark.expressions.validator import (
            ValidationResult,
            validate_expression,
        )

        parse_dtype(dtype)  # raises on a bad dtype spec
        if derived_from is None:
            return ValidationResult(valid=True)
        known = set(self.meta.features) | {self.meta.entity_key}
        return validate_expression(derived_from, known_features=known,
                                   level=kwargs.get("validation_level", "standard"))

    def audit_log(self, **query_kwargs):
        """Audit entries scoped to this group's qualified resource prefix
        (reference: feature_group.py:581-594)."""
        return self.store.audit.query(resource=f"{self.qualified_name()}*",
                                      **query_kwargs)

    def delete(self) -> None:
        self.store.delete_feature_group(self.meta.name, org=self.org,
                                        domain=self.domain, project=self.project)

    @property
    def entity_key(self) -> str:
        return self.meta.entity_key

    @property
    def entity_dtype(self) -> str:
        return str(self.meta.entity_dtype)

    def qualified_feature_name(self, f: Feature) -> str:
        return f"{self.org}/{self.domain}/{self.project}/{self.meta.name}/{f.versioned_name}"

    # -- data plane -------------------------------------------------------------

    def write(self, df: DataFrame, mode: str = "append", key_columns: list[str] | None = None,
              validate: bool = True) -> None:
        from raise_featurestore_spark.io.writer import write_feature_group

        if validate:
            self._validate_constraints(df)
        write_feature_group(df, self.meta.storage_path, mode=mode,
                            key_columns=key_columns or [self.meta.entity_key])
        self.store.audit.log("data", f"write_{mode}", self.meta.storage_path)

    def _validate_constraints(self, df: DataFrame) -> None:
        """Write-path enforcement of the logical constraints Spark's type
        system can't express — embedding dim, string[N] max length, bounded
        arrays, blob content-type whitelist (reference:
        raise_/models/types.py:124-148, which rejects wrong-dim vectors at
        validate()). One distributed aggregate over all constrained
        columns; only the 1-row violation-count summary reaches the driver.
        """
        from raise_featurestore_spark.types import has_constraint, validation_predicate

        checks = []
        for versions in self.meta.features.values():
            for feat in versions:
                if feat.is_derived or feat.physical_column not in df.columns:
                    continue
                if not has_constraint(feat.dtype):
                    continue
                pred = validation_predicate(feat.dtype, F.col(feat.physical_column))
                checks.append(
                    F.sum((~pred).cast("long")).alias(feat.physical_column)
                )
        if not checks:
            return
        row = df.agg(*checks).collect()[0]
        bad = {c: int(v) for c, v in row.asDict().items() if v}
        if bad:
            raise DTypeError(
                f"write rejected: constraint violations (rows per column): {bad}"
            )

    def read(self, spark: SparkSession, features: list[str] | None = None) -> DataFrame:
        """Read the physical table and materialize requested derived/versioned
        features as computed columns."""
        df = spark.read.parquet(self.meta.storage_path)
        want = features or [n for n in self.meta.features] or [
            c for c in df.columns if c != self.meta.entity_key
        ]
        cols = [F.col(self.meta.entity_key)]
        version_map = self._version_map()
        for name in want:
            if name == self.meta.entity_key:
                continue
            feat = self.get_feature(name) if name in self.meta.features or "@v" in name else None
            if feat is None:
                cols.append(F.col(name))
            elif feat.is_derived:
                from raise_featurestore_spark.expressions.compiler import compile_expression

                df, col = compile_expression(
                    df, feat.derived_from, resolver=self._resolver(spark),
                    known_features=set(self.meta.features) | set(df.columns),
                    version_map=version_map,
                )
                cols.append(col.alias(name))
            else:
                col = F.col(feat.physical_column)
                if feat.default is not None:
                    col = F.coalesce(col, F.lit(feat.default))
                cols.append(col.alias(name))
        return df.select(*cols)

    def get(self, spark: SparkSession, entity_ids: list, features: list[str] | None = None
            ) -> DataFrame:
        """Entity point lookup (reference: feature_group.py:393-439)."""
        from raise_featurestore_spark.analytics.record_lookup import point_lookup

        return point_lookup(self.read(spark, features), self.meta.entity_key, entity_ids)

    def analyze(self, spark: SparkSession, analysis, **kwargs) -> DataFrame:
        """Run an Analysis spec against this group (reference:
        feature_group.py:596-614 → analytics/client.py:46-79)."""
        from raise_featurestore_spark.analytics.router import compile_analysis

        return compile_analysis(self.read(spark), analysis, **kwargs)

    # -- expression support ------------------------------------------------------

    def _version_map(self) -> dict[str, str]:
        out: dict[str, str] = {}
        for name, versions in self.meta.features.items():
            for f in versions:
                out[f"{name}@v{f.version}"] = f.physical_column
            latest = self.meta.latest(name)
            if not latest.is_derived:
                out[name] = latest.physical_column
        return out

    def grant_access(self, grantee_org: str, features: list[str] | None = None,
                     role: str = "reader", expires_at: float | None = None):
        """Cross-org grant with wildcard feature patterns and expiry
        (reference: feature_group.py:529-579)."""
        from raise_featurestore_spark.catalog.acl import ExternalGrant

        g = ExternalGrant(grantee_org=grantee_org, features=features or ["*"],
                          role=role, expires_at=expires_at)
        self.meta.grants.append(g)
        self.store.audit.log("acl", "grant_access",
                             f"{self.qualified_name()}:{grantee_org}")
        self.store._save()
        return g

    def grant_external_access(self, org: str, features: list[str] | None = None,
                              permission: str = "read",
                              expires_at: float | None = None):
        """Reference-named form of :meth:`grant_access`
        (raise_/models/feature_group.py:529-579): permission read/write
        maps to the reader/writer roles."""
        role = {"read": "reader", "write": "writer"}.get(permission, permission)
        return self.grant_access(org, features, role=role, expires_at=expires_at)

    def revoke_external_access(self, org: str) -> int:
        """Reference-named form of :meth:`revoke_access`
        (raise_/README.md:576)."""
        return self.revoke_access(org)

    def revoke_access(self, grantee_org: str) -> int:
        before = len(self.meta.grants)
        self.meta.grants = [g for g in self.meta.grants if g.grantee_org != grantee_org]
        self.store.audit.log("acl", "revoke_access",
                             f"{self.qualified_name()}:{grantee_org}")
        self.store._save()
        return before - len(self.meta.grants)

    def qualified_name(self) -> str:
        return f"{self.org}/{self.domain}/{self.project}/{self.meta.name}"

    def _resolver(self, spark: SparkSession):
        """Cross-group reference resolver: ``group.feature`` joins the other
        group's table on the shared entity key (SURVEY §2.3).

        Cross-ORG references are permission-checked at plan time, before
        any plan is built (SURVEY §7 hard-item 5; reference PRD.md:591):
        the reading context's org must hold a valid, unexpired grant
        covering the referenced feature.
        """

        def resolve(ref: FeatureRef):
            org = ref.org or self.org
            domain = ref.domain or self.domain
            project = ref.project or self.project
            if ref.group is None:
                # local versioned ref — same table
                feat = self.get_feature(f"{ref.feature}@{ref.version}" if ref.version else ref.feature)
                df = spark.read.parquet(self.meta.storage_path)
                return df, self.meta.entity_key, self.meta.entity_key, feat.physical_column
            other = self.store.get_feature_group(ref.group, org=org, domain=domain,
                                                 project=project)
            if org != self.org:
                from raise_featurestore_spark.catalog.acl import ACL, check_access

                check_access(ACL(), other.meta.grants, principal_org=self.org,
                             owner_org=org, feature=ref.feature, role="reader")
            feat = other.get_feature(
                f"{ref.feature}@{ref.version}" if ref.version else ref.feature
            )
            df = other.read(spark, [feat.name])
            return df, self.meta.entity_key, other.meta.entity_key, feat.name

        return resolve
