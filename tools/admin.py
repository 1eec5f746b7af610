"""Minimal store-admin CLI — the ops slice of the reference's admin tool
(clients/venice-admin-tool/.../Command.java lists ~100 lifecycle commands;
the query-relevant ones are store creation/listing/describe/version
management).

Usage:
  python tools/admin.py <root> create <store> --keys k1[,k2...] [--partitions N] [--hybrid]
  python tools/admin.py <root> list
  python tools/admin.py <root> describe <store>
  python tools/admin.py <root> versions <store>
  python tools/admin.py <root> update-store <store> key=value [...]
  python tools/admin.py <root> rollback <store> [version]
  python tools/admin.py <root> set-version <store> <version>
  python tools/admin.py <root> retire <store> [--keep N]
  python tools/admin.py <root> delete <store>

Exit codes: 0 ok; 1 catalog error (unknown store, illegal transition);
2 usage error (unknown command, missing/malformed arguments).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from venice_spark.catalog import StoreCatalog, StoreNotFoundError  # noqa: E402


class _UsageError(Exception):
    pass


def _arg(argv: list[str], i: int, what: str) -> str:
    if i >= len(argv):
        raise _UsageError(f"missing {what}")
    return argv[i]


def _int_arg(argv: list[str], i: int, what: str) -> int:
    raw = _arg(argv, i, what)
    try:
        return int(raw)
    except ValueError:
        raise _UsageError(f"{what} must be an integer, got {raw!r}") from None


def _run(argv: list[str]) -> int:
    root, cmd = _arg(argv, 0, "<root>"), _arg(argv, 1, "<command>")
    cat = StoreCatalog(root)
    if cmd == "create":
        store = _arg(argv, 2, "<store>")
        rest = argv[3:]
        if "--keys" not in rest:
            raise _UsageError("create requires --keys k1[,k2...]")
        keys = _arg(rest, rest.index("--keys") + 1, "--keys value").split(",")
        kwargs = {}
        if "--partitions" in rest:
            kwargs["partition_count"] = _int_arg(
                rest, rest.index("--partitions") + 1, "--partitions value"
            )
        if "--hybrid" in rest:
            kwargs["hybrid"] = True
        meta = cat.create_store(store, key_fields=keys, **kwargs)
        print(json.dumps(json.loads(meta.to_json()), indent=2))
    elif cmd == "list":
        for s in cat.list_stores():
            meta = cat.get_store(s)
            print(f"{s}\tcurrent=v{meta.current_version}\tpartitions={meta.partition_count}")
    elif cmd == "describe":
        meta = cat.get_store(_arg(argv, 2, "<store>"))
        print(json.dumps(json.loads(meta.to_json()), indent=2))
        man = cat.version_manifest(argv[2])
        if man:
            print("current version manifest:", json.dumps(man, indent=2))
    elif cmd == "versions":
        store = _arg(argv, 2, "<store>")
        cur = cat.current_version(store)
        for v in cat.list_versions(store):
            man = cat.version_manifest(store, v) or {}
            marker = " *current*" if v == cur else ""
            print(f"v{v}{marker}\trows={man.get('rows', '?')}\ttype={man.get('push_type', '?')}")
    elif cmd == "update-store":
        store = _arg(argv, 2, "<store>")
        changes = {}
        for kv in argv[3:]:
            k, sep, v = kv.partition("=")
            if not sep or not k:
                raise _UsageError(f"update-store arguments are key=value, got {kv!r}")
            if v.lower() in ("true", "false"):
                changes[k] = v.lower() == "true"
            elif v.lstrip("-").isdigit():
                changes[k] = int(v)
            else:
                changes[k] = v
        meta = cat.update_store(store, **changes)
        print(json.dumps(json.loads(meta.to_json()), indent=2))
    elif cmd == "rollback":
        store = _arg(argv, 2, "<store>")
        to = _int_arg(argv, 3, "version") if len(argv) > 3 else None
        v = cat.rollback(store, to)
        print(f"{store} now serving v{v}")
    elif cmd == "set-version":
        store = _arg(argv, 2, "<store>")
        v = _int_arg(argv, 3, "<version>")
        cat.set_version(store, v)
        print(f"{store} now serving v{v}")
    elif cmd == "retire":
        store = _arg(argv, 2, "<store>")
        keep = 2
        if "--keep" in argv:
            keep = _int_arg(argv, argv.index("--keep") + 1, "--keep value")
        gone = cat.retire_old_versions(store, keep=keep)
        print(f"retired versions: {gone or 'none'}")
    elif cmd == "delete":
        store = _arg(argv, 2, "<store>")
        cat.delete_store(store)
        print(f"deleted store {store}")
    else:
        raise _UsageError(f"unknown command {cmd!r}")
    return 0


def main(argv: list[str]) -> int:
    try:
        return _run(argv)
    except _UsageError as e:
        print(f"error: {e}", file=sys.stderr)
        print(__doc__)
        return 2
    except StoreNotFoundError as e:
        # KeyError str() quotes its arg; spell the situation out
        print(f"error: no such store: {e.args[0]}", file=sys.stderr)
        return 1
    except (ValueError, TypeError) as e:
        # catalog-level refusals (illegal update field, nonexistent
        # version) are operational errors, not usage errors
        print(f"error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
