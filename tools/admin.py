"""Minimal store-admin CLI — the ops slice of the reference's admin tool
(clients/venice-admin-tool/.../Command.java lists ~100 lifecycle commands;
the query-relevant ones are store listing/describe/version management).

Usage:
  python tools/admin.py <root> list
  python tools/admin.py <root> describe <store>
  python tools/admin.py <root> versions <store>
  python tools/admin.py <root> update-store <store> key=value [...]
  python tools/admin.py <root> rollback <store> [version]
  python tools/admin.py <root> set-version <store> <version>
  python tools/admin.py <root> retire <store> [--keep N]
  python tools/admin.py <root> delete <store>
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from venice_spark.catalog import StoreCatalog  # noqa: E402


def main(argv: list[str]) -> int:
    if len(argv) < 2:
        print(__doc__)
        return 2
    root, cmd = argv[0], argv[1]
    cat = StoreCatalog(root)
    if cmd == "list":
        for s in cat.list_stores():
            meta = cat.get_store(s)
            print(f"{s}\tcurrent=v{meta.current_version}\tpartitions={meta.partition_count}")
    elif cmd == "describe":
        meta = cat.get_store(argv[2])
        print(json.dumps(json.loads(meta.to_json()), indent=2))
        man = cat.version_manifest(argv[2])
        if man:
            print("current version manifest:", json.dumps(man, indent=2))
    elif cmd == "versions":
        store = argv[2]
        cur = cat.current_version(store)
        for v in cat.list_versions(store):
            man = cat.version_manifest(store, v) or {}
            marker = " *current*" if v == cur else ""
            print(f"v{v}{marker}\trows={man.get('rows', '?')}\ttype={man.get('push_type', '?')}")
    elif cmd == "update-store":
        changes = {}
        for kv in argv[3:]:
            k, _, v = kv.partition("=")
            if v.lower() in ("true", "false"):
                changes[k] = v.lower() == "true"
            elif v.lstrip("-").isdigit():
                changes[k] = int(v)
            else:
                changes[k] = v
        meta = cat.update_store(argv[2], **changes)
        print(json.dumps(json.loads(meta.to_json()), indent=2))
    elif cmd == "rollback":
        to = int(argv[3]) if len(argv) > 3 else None
        v = cat.rollback(argv[2], to)
        print(f"{argv[2]} now serving v{v}")
    elif cmd == "set-version":
        cat.set_version(argv[2], int(argv[3]))
        print(f"{argv[2]} now serving v{argv[3]}")
    elif cmd == "retire":
        keep = 2
        if "--keep" in argv:
            i = argv.index("--keep")
            if i + 1 >= len(argv) or not argv[i + 1].lstrip("-").isdigit():
                print(__doc__)
                return 2
            keep = int(argv[i + 1])
        gone = cat.retire_old_versions(argv[2], keep=keep)
        print(f"retired versions: {gone or 'none'}")
    elif cmd == "delete":
        cat.delete_store(argv[2])
        print(f"deleted store {argv[2]}")
    else:
        print(__doc__)
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
