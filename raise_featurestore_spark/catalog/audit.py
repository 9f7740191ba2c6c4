"""Audit log: entry taxonomy, wildcard queries, cursor pagination, export.

(reference: raise_/models/audit.py:15-477 — categories/actions, wildcard
resource query :154-156, cursor pagination, jsonl/csv/parquet export
:396-413)

Metadata-plane: entries accumulate in-process and can be exported; at scale
the export target would be an append-only table partitioned by day.
"""

from __future__ import annotations

import fnmatch
import json
import time
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


class AuditLog:
    def __init__(self) -> None:
        self.entries: list[AuditEntry] = []

    def log(self, category: str, action: str, resource: str, principal: str = "system",
            **details) -> AuditEntry:
        e = AuditEntry(category=category, action=action, resource=resource,
                       principal=principal, details=details)
        self.entries.append(e)
        return e

    def query(
        self,
        category: str | None = None,
        action: str | None = None,
        resource: str | None = None,  # supports * wildcards
        principal: str | None = None,
        since: float | None = None,
        limit: int = 100,
        cursor: int = 0,
    ) -> tuple[list[AuditEntry], int | None]:
        """Filtered scan with cursor pagination; returns (page, next_cursor)."""
        out: list[AuditEntry] = []
        i = cursor
        while i < len(self.entries) and len(out) < limit:
            e = self.entries[i]
            i += 1
            if category and e.category != category:
                continue
            if action and not fnmatch.fnmatch(e.action, action):
                continue
            if resource and not fnmatch.fnmatch(e.resource, resource):
                continue
            if principal and e.principal != principal:
                continue
            if since and e.timestamp < since:
                continue
            out.append(e)
        next_cursor = i if i < len(self.entries) else None
        return out, next_cursor

    def export(self, path: str, fmt: str = "jsonl") -> int:
        """jsonl / csv / parquet export (reference: audit.py:396-413)."""
        rows = [e.to_dict() for e in self.entries]
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
