"""matchrule rulesets compiled to Column predicates.

Reference: /root/reference/cfg/matchrule/matchrule.go — a Rule matches
when ANY of its values matches in the given mode (prefix/contains/
suffix), lowercasing both sides when ``case_insensitive``; ``invert``
flips the result.  A RuleSet combines its rules with ``cond`` and/or
(matchrule.go Match: and = all, or = any); a list of RuleSets matches
when ANY set matches (mask_struct.go checkMatchRules).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rule_pred(col: Column, rule: dict) -> Column:
    mode = str(rule.get("mode", "prefix")).lower()
    values = [str(v) for v in rule.get("values", [])]
    ci = bool(rule.get("case_insensitive", False))
    c = F.lower(col) if ci else col
    if ci:
        values = [v.lower() for v in values]
    p = F.lit(False)
    for v in values:
        if mode == "prefix":
            p = p | c.startswith(v)
        elif mode == "suffix":
            p = p | c.endswith(v)
        else:
            p = p | c.contains(v)
    if rule.get("invert", False):
        p = ~p
    return p


def ruleset_pred(col: Column, ruleset: dict) -> Column:
    rules = ruleset.get("rules", [])
    if not rules:
        return F.lit(False)
    cond = str(ruleset.get("cond", "and")).lower()
    out = rule_pred(col, rules[0])
    for r in rules[1:]:
        p = rule_pred(col, r)
        out = (out | p) if cond == "or" else (out & p)
    return out


def rulesets_pred(col: Column, rulesets: list[dict] | None) -> Column:
    """True when ANY ruleset matches; no rulesets at all = always true
    (checkMatchRules on an empty list)."""
    if not rulesets:
        return F.lit(True)
    p = F.lit(False)
    for rs in rulesets:
        p = p | ruleset_pred(col, rs)
    return p
