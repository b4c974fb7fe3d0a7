#!/usr/bin/env python3
"""Docs truth sweep: mechanically diff the query registry in
SparkEntry.scala against the hand-maintained coverage docs (README.md
operator table, NOTES.md counts).

Checks:
  1. every `"qNNN_name" -> ` query key in SparkEntry.queries appears
     somewhere in README.md (the coverage map must not silently lag);
  2. every qNNN token README/NOTES mention exists in the registry
     (no stale references to renamed/removed queries);
  3. every query key has an oracleSql entry (same-file sanity — the
     EntryContractSpec pins this at runtime too);
  4. the query count claimed in README ("N oracle-checked queries")
     matches the registry.

Exit 1 on any drift, printing what drifted.
"""
import re
import sys

ENTRY = "src/main/scala/graft/SparkEntry.scala"


def main():
    src = open(ENTRY).read()
    readme = open("README.md").read()
    notes = open("NOTES.md").read()

    # query keys: "qNN_name" -> appearing in `queries` and `oracleSql`;
    # each key appears exactly twice (query + oracle) when complete
    keys = re.findall(r'"(q\d+_[a-z0-9_]+)"\s*->', src)
    registry = sorted(set(keys))
    dup_counts = {k: keys.count(k) for k in registry}

    bad = False

    missing_oracle = [k for k, c in dup_counts.items() if c < 2]
    if missing_oracle:
        bad = True
        print(f"queries without an oracleSql entry: {missing_oracle}")

    # 1. registry -> README: covered if the full name OR the bare qNN
    #    token appears (the coverage map lists run-1..8 queries as qNN)
    readme_bare = set(re.findall(r"\bq\d+\b", readme))
    # expand range notation `qNN`-`qMM`
    for lo, hi in re.findall(r"q(\d+)`?\s*[-–]\s*`?q(\d+)", readme):
        for i in range(int(lo), int(hi) + 1):
            readme_bare.add(f"q{i:02d}" if int(lo) < 100 else f"q{i}")
            readme_bare.add(f"q{i}")
    not_in_readme = [
        k for k in registry
        if k not in readme and k.split("_")[0] not in readme_bare
    ]
    if not_in_readme:
        bad = True
        print(f"queries missing from README coverage map ({len(not_in_readme)}):")
        for k in not_in_readme:
            print(f"  {k}")

    # 2. doc q-references -> registry (full qNNN_name tokens only;
    #    bare qNNN mentions are prose shorthand, skipped)
    for doc_name, doc in [("README.md", readme), ("NOTES.md", notes)]:
        refs = set(re.findall(r"\bq\d+_[a-z0-9_]+\b", doc))
        stale = sorted(r for r in refs if r not in registry)
        if stale:
            bad = True
            print(f"stale query references in {doc_name}: {stale}")

    # 4. claimed count vs registry
    m = re.search(r"\*\*(\d+)\s*\noracle-checked queries\*\*|\*\*(\d+) oracle-checked queries\*\*", readme)
    if m:
        claimed = int(m.group(1) or m.group(2))
        if claimed != len(registry):
            bad = True
            print(f"README claims {claimed} oracle-checked queries; registry has {len(registry)}")
    else:
        print("NOTE: no 'N oracle-checked queries' claim found in README to cross-check")

    print(f"registry: {len(registry)} queries; drift: {'YES' if bad else 'none'}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
