"""Roles, grants and session access control (SqlBase.g4:95-123) plus
transactional DML over CoW tables (SqlBase.g4:150-152).

Reference parity: Trino's role/grant statements resolve through
``io.trino.metadata.MetadataManager`` into the connector's access-control
SPI (``core/trino-spi/.../security/ConnectorAccessControl.java``), with
enforcement at analysis time (``io.trino.security.AccessControlManager``:
denyed tables raise before planning). The model here is the same shape:

- roles are named principals; users are granted roles (``GRANT r TO USER
  u``) and activate them with ``SET ROLE`` (Trino's per-session enabled
  roles, ``SelectedRole``);
- table privileges (SELECT/INSERT/DELETE/UPDATE) are granted to users or
  roles; an operation is allowed when the session user or any enabled role
  holds the privilege;
- enforcement is opt-in (``enable_enforcement``) — mirroring Trino's
  default allow-all system access control vs. configured file/ranger ACLs.

Transactions (START TRANSACTION / COMMIT / ROLLBACK): Trino wraps each
query in a transaction and supports explicit multi-statement transactions
against connectors that implement ``beginTransaction``
(``io.trino.transaction.TransactionManager``). Here the transactional
resources are the engine's copy-on-write tables (api.py): START records
every CoW table's snapshot version; mutations inside the transaction write
new snapshots as usual (read-your-writes within the session); ROLLBACK
repoints every table to its recorded version as a new commit (history is
preserved, exactly the CoW rollback model); COMMIT simply forgets the
savepoints. Old snapshots are immutable, so concurrent readers of
pre-transaction versions are never disturbed — snapshot isolation by
construction.
"""

from __future__ import annotations

from dataclasses import dataclass, field

PRIVILEGES = ("SELECT", "INSERT", "DELETE", "UPDATE")


class AccessDeniedError(PermissionError):
    """Raised when enforcement is on and the principal lacks a privilege
    (Trino: AccessDeniedException, io.trino.spi.security)."""


@dataclass
class AccessControl:
    roles: set[str] = field(default_factory=set)
    # role -> users granted the role
    members: dict[str, set[str]] = field(default_factory=dict)
    # (principal, table) -> privileges; principal is 'user:NAME' or 'role:NAME'
    grants: dict[tuple[str, str], set[str]] = field(default_factory=dict)
    enforce: bool = False

    # -- role DDL ---------------------------------------------------------

    def create_role(self, role: str) -> None:
        if role in self.roles:
            raise ValueError(f"Role '{role}' already exists")
        self.roles.add(role)
        self.members.setdefault(role, set())

    def drop_role(self, role: str) -> None:
        if role not in self.roles:
            raise ValueError(f"Role '{role}' does not exist")
        self.roles.discard(role)
        self.members.pop(role, None)
        for key in [k for k in self.grants if k[0] == f"role:{role}"]:
            del self.grants[key]

    def grant_role(self, role: str, user: str) -> None:
        if role not in self.roles:
            raise ValueError(f"Role '{role}' does not exist")
        self.members[role].add(user)

    def revoke_role(self, role: str, user: str) -> None:
        self.members.get(role, set()).discard(user)

    # -- table privileges -------------------------------------------------

    @staticmethod
    def _principal(kind: str, name: str) -> str:
        return f"{kind.lower()}:{name}"

    def grant(self, privileges: list[str], table: str, kind: str, name: str) -> None:
        privs = (
            set(PRIVILEGES)
            if any(p.upper() == "ALL" for p in privileges)
            else {p.upper() for p in privileges}
        )
        bad = privs - set(PRIVILEGES)
        if bad:
            raise ValueError(f"unknown privilege(s) {sorted(bad)}")
        if kind.lower() == "role" and name not in self.roles:
            raise ValueError(f"Role '{name}' does not exist")
        key = (self._principal(kind, name), table.lower())
        self.grants.setdefault(key, set()).update(privs)

    def revoke(self, privileges: list[str], table: str, kind: str, name: str) -> None:
        privs = (
            set(PRIVILEGES)
            if any(p.upper() == "ALL" for p in privileges)
            else {p.upper() for p in privileges}
        )
        key = (self._principal(kind, name), table.lower())
        if key in self.grants:
            self.grants[key] -= privs
            if not self.grants[key]:
                del self.grants[key]

    # -- checks -----------------------------------------------------------

    def user_roles(self, user: str) -> set[str]:
        return {r for r, us in self.members.items() if user in us}

    def allowed(
        self, user: str, enabled_roles: set[str], privilege: str, table: str
    ) -> bool:
        if not self.enforce:
            return True
        principals = {f"user:{user}"} | {f"role:{r}" for r in enabled_roles}
        return any(
            privilege.upper() in self.grants.get((p, table.lower()), ())
            for p in principals
        )

    def check(
        self, user: str, enabled_roles: set[str], privilege: str, table: str
    ) -> None:
        if not self.allowed(user, enabled_roles, privilege, table):
            raise AccessDeniedError(
                f"Access Denied: Cannot select from table {table}"
                if privilege.upper() == "SELECT"
                else f"Access Denied: Cannot {privilege.lower()} table {table}"
            )

    def grants_for(self, table: str | None = None) -> list[tuple[str, str, str]]:
        """SHOW GRANTS rows: (grantee, privilege, table)."""
        out = []
        for (principal, tbl), privs in sorted(self.grants.items()):
            if table is not None and tbl != table.lower():
                continue
            for p in sorted(privs):
                out.append((principal, p, tbl))
        return out
