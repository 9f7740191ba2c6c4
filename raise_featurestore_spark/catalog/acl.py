"""Access control: role implication, inheritance merge, external grants.

(reference: raise_/models/acl.py:17-205 — reader/writer/admin implication
chain, inheritance cascade + merge :118-129, ExternalGrant cross-org with
expiry and wildcard features :151-205; enforcement hooks
feature_group.py:509-579)

Plan-time enforcement: the expression compiler's resolver consults
``check_access`` before resolving a cross-group/cross-org reference
(SURVEY §7 hard-problem 5) — permissions are checked before any Spark plan
is built, never per-row.
"""

from __future__ import annotations

import fnmatch
import time
from dataclasses import dataclass, field

ROLES = ("reader", "writer", "admin")
# admin implies writer implies reader
_IMPLIES = {"admin": {"admin", "writer", "reader"}, "writer": {"writer", "reader"},
            "reader": {"reader"}}


class AccessDeniedError(PermissionError):
    pass


@dataclass
class ACL:
    readers: set[str] = field(default_factory=set)
    writers: set[str] = field(default_factory=set)
    admins: set[str] = field(default_factory=set)

    def grant(self, principal: str, role: str) -> None:
        if role not in ROLES:
            raise ValueError(f"unknown role {role!r}")
        getattr(self, role + "s").add(principal)

    def revoke(self, principal: str, role: str) -> None:
        getattr(self, role + "s").discard(principal)

    def roles_of(self, principal: str) -> set[str]:
        out: set[str] = set()
        for role in ROLES:
            if principal in getattr(self, role + "s") or "*" in getattr(self, role + "s"):
                out |= _IMPLIES[role]
        return out

    def allows(self, principal: str, role: str) -> bool:
        return role in self.roles_of(principal)

    def merge(self, parent: "ACL") -> "ACL":
        """Inheritance cascade: union with the parent level's principals
        (reference: acl.py:118-129)."""
        return ACL(
            readers=self.readers | parent.readers,
            writers=self.writers | parent.writers,
            admins=self.admins | parent.admins,
        )


@dataclass
class ExternalGrant:
    """Cross-org access grant with expiry and wildcard feature patterns
    (reference: acl.py:151-205)."""

    grantee_org: str
    features: list[str] = field(default_factory=lambda: ["*"])  # wildcard patterns
    role: str = "reader"
    expires_at: float | None = None

    def is_valid(self, now: float | None = None) -> bool:
        return self.expires_at is None or (now or time.time()) < self.expires_at

    def covers(self, feature: str) -> bool:
        return any(fnmatch.fnmatch(feature, pat) for pat in self.features)


def check_access(acl: ACL, grants: list[ExternalGrant], principal_org: str, owner_org: str,
                 feature: str, role: str = "reader") -> None:
    """Raise AccessDeniedError unless the principal org may access the feature."""
    if principal_org == owner_org:
        return  # same-org access governed by the (already-merged) ACL roles
    for g in grants:
        if g.grantee_org == principal_org and g.is_valid() and g.covers(feature) \
                and role in _IMPLIES.get(g.role, set()):
            return
    raise AccessDeniedError(
        f"org {principal_org!r} has no valid grant for {owner_org!r}:{feature} ({role})"
    )
