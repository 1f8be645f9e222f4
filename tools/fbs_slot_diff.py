#!/usr/bin/env python3
"""Diff field-slot assignments between two FlatBuffers schemas.

Usage:
    python3 tools/fbs_slot_diff.py engine.fbs /path/to/odf.fbs [--map NAME=NAME ...]

Purpose (PROTOCOL.md §6.3): the graft server's `engine.fbs` is
self-declared normative because the ODF project's generated schema ships
only as a Cargo dependency of the reference — unavailable offline. When a
network window allows downloading the public ODF schema (the
open-data-fabric spec repo's generated .fbs), this script closes the
byte-compat question: it parses both schemas, resolves each table field to
its vtable slot id (explicit `(id: N)` attribute, else declaration order —
the FlatBuffers default), and reports, per table, fields whose slot ids
disagree, fields present on only one side, and type-string mismatches.

Name normalization: snake_case and camelCase compare equal
(`dataset_id` == `datasetId`), and `--map` entries rename tables across
schemas (e.g. `--map Vocabulary=DatasetVocabulary`).

Exit code 0 = slot-compatible (warnings allowed for type-string drift),
1 = slot mismatch found, 2 = usage/parse error.
"""
import re
import sys


def norm(name: str) -> str:
    return re.sub(r"_", "", name).lower()


def parse_fbs(path: str):
    """-> {table_name: {norm_field: (slot, type, raw_field)}}"""
    text = open(path).read()
    # strip comments
    text = re.sub(r"//[^\n]*", "", text)
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    tables = {}
    for kind, name, body in re.findall(
            r"\b(table|struct)\s+(\w+)\s*\{(.*?)\}", text, flags=re.S):
        fields = {}
        next_id = 0
        for raw_field, ftype, attrs in re.findall(
                r"(\w+)\s*:\s*([^;(]+?)\s*(\([^)]*\))?\s*;", body):
            m = re.search(r"id\s*:\s*(\d+)", attrs or "")
            slot = int(m.group(1)) if m else next_id
            next_id = slot + 1
            fields[norm(raw_field)] = (slot, ftype.strip(), raw_field)
        tables[name] = (kind, fields)
    return tables


def main(argv):
    args = []
    maps = {}
    it = iter(argv[1:])
    for a in it:
        if a == "--map":
            k, v = next(it).split("=", 1)
            maps[k] = v
        elif a.startswith("--map="):
            k, v = a.split("=", 1)[1].split("=", 1)
            maps[k] = v
        else:
            args.append(a)
    if len(args) != 2:
        print(__doc__)
        return 2
    ours = parse_fbs(args[0])
    theirs = parse_fbs(args[1])
    bad = 0
    for name, (kind, fields) in sorted(ours.items()):
        their_name = maps.get(name, name)
        if their_name not in theirs:
            print(f"[only-ours] {kind} {name} (no '{their_name}' in theirs)")
            continue
        tkind, tfields = theirs[their_name]
        for nf, (slot, ftype, raw) in sorted(fields.items(), key=lambda kv: kv[1][0]):
            if nf not in tfields:
                print(f"[field-only-ours] {name}.{raw} (slot {slot})")
                bad += 1
                continue
            tslot, ttype, traw = tfields[nf]
            if slot != tslot:
                print(f"[SLOT MISMATCH] {name}.{raw}: ours={slot} theirs={tslot}")
                bad += 1
            elif norm(ftype) != norm(ttype):
                print(f"[type-drift] {name}.{raw}: ours '{ftype}' theirs '{ttype}'"
                      " (check wire width/encoding manually)")
        for nf, (tslot, ttype, traw) in sorted(tfields.items(), key=lambda kv: kv[1][0]):
            if nf not in fields:
                print(f"[field-only-theirs] {their_name}.{traw} (slot {tslot})")
    print(("SLOT-COMPATIBLE" if bad == 0 else f"{bad} slot/field mismatches"))
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))
