#!/usr/bin/env python3
"""Diff two PlanDigest artifacts (bench/plans_r{N}.json): the round-workflow
check that catches silent plan regressions (broadcast→shuffle flips, lost
pushdowns) independently of wall-time noise.

Usage: python3 tools/plans_diff.py bench/plans_r7.json bench/plans_r8.json
Exit 0 = no digest changes; 1 = changes (each shown as a unified plan diff).
"""
import difflib, json, sys

old, new = (json.load(open(p)) for p in sys.argv[1:3])
added = sorted(set(new) - set(old))
removed = sorted(set(old) - set(new))
changed = sorted(q for q in set(old) & set(new)
                 if old[q]["digest"] != new[q]["digest"])
for q in added:
    print(f"ADDED   {q}")
for q in removed:
    print(f"REMOVED {q}")
for q in changed:
    print(f"CHANGED {q}  {old[q]['digest']} -> {new[q]['digest']}")
    a, b = old[q]["plan"].splitlines(), new[q]["plan"].splitlines()
    for line in difflib.unified_diff(a, b, "old", "new", lineterm="", n=1):
        print("   " + line)
print(f"\n{len(changed)} changed, {len(added)} added, {len(removed)} removed "
      f"of {len(new)} queries")
sys.exit(1 if changed else 0)
