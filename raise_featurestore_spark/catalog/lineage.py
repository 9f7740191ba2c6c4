"""Feature reference paths + lineage graph.

Path grammar (reference: raise_/models/lineage.py:24-141):

    feature                          (same group)
    feature@v2                       (explicit version)
    group.feature                    (same project)
    project/group.feature            (same domain)
    domain/project/group.feature     (same org)
    @org/domain/project/group.feature  (cross-org)

Lineage is metadata-plane: a DAG over derived features with transitive
closure both directions and DFS cycle detection
(reference: raise_/models/lineage.py:156-338, validator.py:354-426).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_REF_RE = re.compile(
    r"^(?P<org>@[A-Za-z_][\w-]*/)?"
    r"(?P<path>(?:[A-Za-z_][\w-]*/)*)"
    r"(?P<group>[A-Za-z_][\w-]*\.)?"
    r"(?P<feature>[A-Za-z_]\w*)"
    r"(?P<version>@v\d+)?$"
)


class InvalidReferenceError(ValueError):
    pass


class CycleError(ValueError):
    pass


@dataclass(frozen=True)
class FeatureRef:
    """A parsed (possibly partial) feature path; None = inherited from context."""

    feature: str
    group: str | None = None
    project: str | None = None
    domain: str | None = None
    org: str | None = None
    version: str | None = None

    def qualified(self, ctx: "FeatureRef | None" = None) -> str:
        org = self.org or (ctx.org if ctx else None) or "?"
        domain = self.domain or (ctx.domain if ctx else None) or "?"
        project = self.project or (ctx.project if ctx else None) or "?"
        group = self.group or (ctx.group if ctx else None) or "?"
        v = f"@{self.version}" if self.version else ""
        return f"{org}/{domain}/{project}/{group}/{self.feature}{v}"

    @property
    def is_local(self) -> bool:
        return self.group is None and self.org is None and not self.project


def parse_reference(ref: str) -> FeatureRef:
    """Parse one reference path (reference: lineage.py:52-141)."""
    m = _REF_RE.match(ref.strip())
    if not m:
        raise InvalidReferenceError(f"invalid feature reference: {ref!r}")
    org = m.group("org")[1:-1] if m.group("org") else None
    segments = [s for s in m.group("path").split("/") if s]
    group = m.group("group")[:-1] if m.group("group") else None
    version = m.group("version")[1:] if m.group("version") else None
    domain = project = None
    if org is not None:
        # @org/domain/project/group.feature requires the full path
        if len(segments) != 2 or group is None:
            raise InvalidReferenceError(
                f"cross-org reference must be @org/domain/project/group.feature: {ref!r}"
            )
        domain, project = segments
    elif len(segments) == 2:
        domain, project = segments
    elif len(segments) == 1:
        project = segments[0]
    elif len(segments) > 2:
        raise InvalidReferenceError(f"too many path segments in {ref!r}")
    if segments and group is None:
        raise InvalidReferenceError(f"path reference must end in group.feature: {ref!r}")
    return FeatureRef(
        feature=m.group("feature"),
        group=group,
        project=project,
        domain=domain,
        org=org,
        version=version,
    )


@dataclass
class LineageGraph:
    """DAG of qualified feature name → set of direct upstream names."""

    upstream: dict[str, set[str]] = field(default_factory=dict)

    def add(self, feature: str, deps: set[str]) -> None:
        self._check_no_cycle(feature, deps)
        self.upstream.setdefault(feature, set()).update(deps)

    def direct_upstream(self, feature: str) -> set[str]:
        return set(self.upstream.get(feature, set()))

    def direct_downstream(self, feature: str) -> set[str]:
        return {f for f, deps in self.upstream.items() if feature in deps}

    def all_upstream(self, feature: str) -> set[str]:
        """Transitive closure of dependencies."""
        seen: set[str] = set()
        stack = [feature]
        while stack:
            for dep in self.upstream.get(stack.pop(), set()):
                if dep not in seen:
                    seen.add(dep)
                    stack.append(dep)
        return seen

    def all_downstream(self, feature: str) -> set[str]:
        seen: set[str] = set()
        stack = [feature]
        while stack:
            cur = stack.pop()
            for f in self.direct_downstream(cur):
                if f not in seen:
                    seen.add(f)
                    stack.append(f)
        return seen

    def _check_no_cycle(self, feature: str, new_deps: set[str]) -> None:
        """DFS from each new dep; reaching ``feature`` again is a cycle
        (reference: validator.py:354-426)."""
        for dep in new_deps:
            if dep == feature:
                raise CycleError(f"feature {feature} cannot depend on itself")
            stack, seen = [dep], set()
            while stack:
                cur = stack.pop()
                if cur == feature:
                    raise CycleError(f"cycle: {feature} -> {dep} -> ... -> {feature}")
                if cur in seen:
                    continue
                seen.add(cur)
                stack.extend(self.upstream.get(cur, set()))

    def render_ascii(self, feature: str, indent: str = "") -> str:
        """ASCII tree of upstream lineage (reference: lineage.py:282-338)."""
        lines = [f"{indent}{feature}"]
        for dep in sorted(self.upstream.get(feature, set())):
            lines.append(self.render_ascii(dep, indent + "  └─ "))
        return "\n".join(lines)


@dataclass
class RootedLineageGraph:
    """A LineageGraph viewed from one feature — the object
    ``Lineage.as_graph()`` returns so ``.to_ascii()`` needs no root arg
    (reference: raise_/models/lineage.py:236-338)."""

    graph: LineageGraph
    root: str

    def to_ascii(self) -> str:
        return self.graph.render_ascii(self.root)

    def direct_upstream(self) -> set[str]:
        return self.graph.direct_upstream(self.root)

    def direct_downstream(self) -> set[str]:
        return self.graph.direct_downstream(self.root)


@dataclass
class Lineage:
    """Per-feature lineage handle (reference: raise_/models/lineage.py:
    156-232): direct + transitive dependencies/dependents and the graph
    view. Backed by the store-wide LineageGraph rather than per-object
    backrefs — same query surface, one source of truth."""

    feature: str
    graph: LineageGraph

    @property
    def upstream(self) -> list[str]:
        return sorted(self.graph.direct_upstream(self.feature))

    @property
    def downstream(self) -> list[str]:
        return sorted(self.graph.direct_downstream(self.feature))

    def all_upstream(self) -> list[str]:
        return sorted(self.graph.all_upstream(self.feature))

    def all_downstream(self) -> list[str]:
        return sorted(self.graph.all_downstream(self.feature))

    def as_graph(self) -> RootedLineageGraph:
        return RootedLineageGraph(self.graph, self.feature)

    def to_dict(self) -> dict:
        return {
            "feature": self.feature,
            "upstream": self.upstream,
            "downstream": self.downstream,
        }
