"""Audit log: entry taxonomy, wildcard queries, cursor pagination, alerts,
streaming export, retention config.

(reference: raise_/models/audit.py:15-477 — categories/actions, wildcard
resource query :154-156, cursor pagination, AuditAlert :201-254,
AuditConfig :256-285, jsonl/csv/parquet export :396-413, AuditStream
:428-450)

Metadata-plane: entries accumulate in-process and can be exported; at scale
the export target would be an append-only table partitioned by day, and
``stream()`` maps to a cursor scan over that table.
"""

from __future__ import annotations

import fnmatch
import json
import time
from collections.abc import Iterator
from dataclasses import dataclass, field


@dataclass
class AuditEntry:
    category: str  # catalog | data | access | analytics
    action: str
    resource: str
    principal: str = "system"
    timestamp: float = field(default_factory=time.time)
    details: dict = field(default_factory=dict)

    def to_dict(self) -> dict:
        return {
            "category": self.category,
            "action": self.action,
            "resource": self.resource,
            "principal": self.principal,
            "timestamp": self.timestamp,
            "details": self.details,
        }


@dataclass
class AuditQuery:
    """Reusable filter spec (reference: audit.py:127-180). ``resource`` and
    ``actions`` support ``*`` wildcards; ``exclude_principals`` inverts a
    principal match (the reference's exclude_actor_orgs)."""

    category: str | None = None
    actions: list[str] | None = None
    resource: str | None = None
    principal: str | None = None
    exclude_principals: list[str] | None = None
    since: float | None = None
    until: float | None = None

    def matches(self, e: "AuditEntry") -> bool:
        if self.category and e.category != self.category:
            return False
        if self.actions and not any(fnmatch.fnmatch(e.action, a) for a in self.actions):
            return False
        if self.resource and not fnmatch.fnmatch(e.resource, self.resource):
            return False
        if self.principal and e.principal != self.principal:
            return False
        if self.exclude_principals and e.principal in self.exclude_principals:
            return False
        if self.since and e.timestamp < self.since:
            return False
        if self.until and e.timestamp >= self.until:
            return False
        return True


@dataclass
class AuditQueryResult:
    """One page + pagination state (reference: audit.py:183-198)."""

    entries: list["AuditEntry"]
    next_cursor: int | None
    total_count: int

    @property
    def has_more(self) -> bool:
        return self.next_cursor is not None

    def __iter__(self):
        return iter(self.entries)

    def __len__(self) -> int:
        return len(self.entries)


@dataclass
class AuditAlert:
    """Standing query that fires on matching entries at log time
    (reference: audit.py:201-254)."""

    name: str
    query: AuditQuery
    notify: list[str] = field(default_factory=list)
    channels: list[str] = field(default_factory=lambda: ["email"])
    enabled: bool = True
    fired: list["AuditEntry"] = field(default_factory=list)


@dataclass
class AuditConfig:
    """Org-level retention policy (reference: audit.py:256-285)."""

    retention_days: int = 365
    immutable: bool = False
    export_destination: str | None = None

    def to_dict(self) -> dict:
        return {
            "retention_days": self.retention_days,
            "immutable": self.immutable,
            "export_destination": self.export_destination,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "AuditConfig":
        return cls(
            retention_days=d.get("retention_days", 365),
            immutable=d.get("immutable", False),
            export_destination=d.get("export_destination"),
        )


class AuditLog:
    def __init__(self) -> None:
        self.entries: list[AuditEntry] = []
        self.alerts: dict[str, AuditAlert] = {}

    def log(self, category: str, action: str, resource: str, principal: str = "system",
            **details) -> AuditEntry:
        e = AuditEntry(category=category, action=action, resource=resource,
                       principal=principal, details=details)
        self.entries.append(e)
        for alert in self.alerts.values():
            if alert.enabled and alert.query.matches(e):
                alert.fired.append(e)
        return e

    def query(
        self,
        category: str | None = None,
        action: str | None = None,
        actions: list[str] | None = None,
        resource: str | None = None,  # supports * wildcards
        principal: str | None = None,
        exclude_principals: list[str] | None = None,
        since: float | None = None,
        until: float | None = None,
        limit: int = 100,
        cursor: int = 0,
        query: AuditQuery | None = None,
    ) -> AuditQueryResult:
        """Filtered scan with cursor pagination. Accepts either a prebuilt
        AuditQuery or the individual filter kwargs."""
        q = query or AuditQuery(
            category=category,
            actions=([action] if action else None) if actions is None else actions,
            resource=resource,
            principal=principal,
            exclude_principals=exclude_principals,
            since=since,
            until=until,
        )
        out: list[AuditEntry] = []
        i = cursor
        while i < len(self.entries) and len(out) < limit:
            e = self.entries[i]
            i += 1
            if q.matches(e):
                out.append(e)
        next_cursor = i if i < len(self.entries) else None
        return AuditQueryResult(entries=out, next_cursor=next_cursor,
                                total_count=sum(q.matches(e) for e in self.entries))

    # -- alerts (reference: audit.py:349-393) --------------------------------

    def create_alert(self, name: str, query: AuditQuery,
                     notify: list[str] | None = None,
                     channels: list[str] | None = None) -> AuditAlert:
        alert = AuditAlert(name=name, query=query, notify=notify or [],
                           channels=channels or ["email"])
        self.alerts[name] = alert
        return alert

    def list_alerts(self) -> list[AuditAlert]:
        return sorted(self.alerts.values(), key=lambda a: a.name)

    def get_alert(self, name: str) -> AuditAlert | None:
        return self.alerts.get(name)

    def delete_alert(self, name: str) -> bool:
        return self.alerts.pop(name, None) is not None

    # -- streaming export (reference: audit.py:415-450) ----------------------

    def stream(self, query: AuditQuery | None = None) -> "AuditStream":
        return AuditStream(self, query or AuditQuery())

    # -- retention (reference: audit.py:256-285 + examples/05 config) --------

    def prune(self, config: AuditConfig, now: float | None = None) -> int:
        """Enforce the retention policy: drop entries older than
        ``retention_days``, archiving them to ``export_destination`` first.
        An immutable log with no archive destination refuses to prune —
        records may never be silently destroyed."""
        import os
        import time as _time

        cutoff = (now or _time.time()) - config.retention_days * 86400
        old = [e for e in self.entries if e.timestamp < cutoff]
        if not old:
            return 0
        if config.immutable and not config.export_destination:
            raise ValueError(
                "immutable audit log has no export_destination; refusing to "
                "destroy records"
            )
        if config.export_destination:
            os.makedirs(config.export_destination, exist_ok=True)
            dest = os.path.join(
                config.export_destination, f"audit_pruned_{int(cutoff)}.jsonl"
            )
            with open(dest, "w") as fh:
                for e in old:
                    fh.write(json.dumps(e.to_dict(), default=str) + "\n")
        self.entries = [e for e in self.entries if e.timestamp >= cutoff]
        return len(old)

    def export(self, path: str, fmt: str = "jsonl",
               query: AuditQuery | None = None) -> int:
        """jsonl / csv / parquet export, optionally query-filtered
        (reference: audit.py:396-413)."""
        entries = [e for e in self.entries if query.matches(e)] if query else self.entries
        rows = [e.to_dict() for e in entries]
        if fmt == "jsonl":
            with open(path, "w") as fh:
                for r in rows:
                    fh.write(json.dumps(r, default=str) + "\n")
        elif fmt == "csv":
            import csv

            with open(path, "w", newline="") as fh:
                w = csv.DictWriter(
                    fh, fieldnames=["category", "action", "resource", "principal",
                                    "timestamp", "details"]
                )
                w.writeheader()
                for r in rows:
                    r["details"] = json.dumps(r["details"], default=str)
                    w.writerow(r)
        elif fmt == "parquet":
            import pandas as pd

            pd.DataFrame(rows).to_parquet(path)
        else:
            raise ValueError(f"unknown export format {fmt!r}")
        return len(rows)


class AuditStream:
    """Batched cursor scan for large exports (reference: audit.py:428-450).
    At warehouse scale this is a paginated scan over the audit table; here it
    pages the in-process log with the same cursor protocol."""

    def __init__(self, log: AuditLog, query: AuditQuery):
        self._log = log
        self._query = query

    def __enter__(self) -> "AuditStream":
        return self

    def __exit__(self, exc_type, exc_val, exc_tb) -> None:
        return None

    def batches(self, size: int = 1000) -> Iterator[list[AuditEntry]]:
        cursor = 0
        while True:
            page = self._log.query(query=self._query, limit=size, cursor=cursor)
            if page.entries:
                yield page.entries
            if not page.has_more:
                break
            cursor = page.next_cursor
