#!/usr/bin/env python3
"""Extract relation assertions from the reference TestMain.cpp into a TSV:
dataset \t mode \t expect(1/0) \t inner-string
mode: pred | de9im | dist1 | dist5000
Only set-membership assertions on the output string are extracted
(numReferences and regex checks are handled manually in ScalaTest)."""
import re, sys

src = open("/root/reference/src/spatialjoin/tests/TestMain.cpp").read()

events = []
for m in re.finditer(r'cfg\.computeDE9IM = true', src):
    events.append((m.start(), "mode", "de9im"))
for m in re.finditer(r'cfg\.withinDist = 1;', src):
    events.append((m.start(), "mode", "dist1"))
for m in re.finditer(r'cfg\.withinDist = 5000;', src):
    events.append((m.start(), "mode", "dist5000"))
for m in re.finditer(r'fullRun\([^"]*"/(\w+)"', src):
    events.append((m.start(), "ds", m.group(1)))
for m in re.finditer(
        r'res\.find\(\s*"((?:[^"\\]|\\.)*)"\s*\)\s*([!=]=)\s*\n?\s*std::string::npos',
        src):
    events.append((m.start(), "assert", (m.group(1), m.group(2))))

events.sort(key=lambda e: e[0])
dataset, mode = None, "pred"
out = []
for _, kind, val in events:
    if kind == "mode":
        mode = val
    elif kind == "ds":
        dataset = val
    else:
        s, op = val
        expect = "1" if op == "!=" else "0"
        # only \t and \\ occur in these strings; unicode_escape would
        # mangle the UTF-8 umlauts in fixture ids
        s = s.replace("\\t", "\t").replace("\\\\", "\\")
        out.append(f"{dataset}\t{mode}\t{expect}\t{s}")

sys.stdout.write("\n".join(out) + "\n")
