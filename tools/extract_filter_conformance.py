"""Extract (query, special_fields, document, expected-bool) match cases
from the reference's filter DSL unit suite
(tests/unit/filter/test_lucene_filter.py) into a JSON fixture the engine's
FilterMatchConformanceSpec replays through FilterCompiler.

Extracted shapes:
  - assert [not] LuceneFilter.create(<str>[, <dict>]).matches(<dict>)
  - lucene_filter = LuceneFilter.create(...)   then later
    assert [not] lucene_filter.matches(<dict>)

xfail-marked methods and non-literal arguments are skipped (counted).
"""
import ast, json, sys

SRC = "/root/reference/tests/unit/filter/test_lucene_filter.py"
OUT = "/root/repo/src/test/resources/conformance/filter_matches.json"


def lit(node):
    try:
        return ast.literal_eval(node)
    except Exception:
        return None


def create_args(call):
    """LuceneFilter.create(query[, special_fields]) -> (query, special) or None."""
    if not (isinstance(call, ast.Call) and isinstance(call.func, ast.Attribute)
            and call.func.attr == "create"):
        return None
    if not (isinstance(call.func.value, ast.Name)
            and call.func.value.id == "LuceneFilter"):
        return None
    if not call.args:
        return None
    query = lit(call.args[0])
    if not isinstance(query, str):
        return None
    special = lit(call.args[1]) if len(call.args) > 1 else None
    if len(call.args) > 1 and special is None:
        return None
    return query, special


def is_xfail(fn):
    for dec in fn.decorator_list:
        txt = ast.unparse(dec)
        if "xfail" in txt:
            return True
    return False


def doc_with_vars(node, values):
    """Evaluate a dict literal whose values may reference loop vars
    bound in `values` (the `for value in [..]: assert f.matches({'k': value})`
    shape of the range suites)."""
    if not isinstance(node, ast.Dict):
        return None
    out = {}
    for k, v in zip(node.keys, node.values):
        key = lit(k)
        if key is None and not (isinstance(k, ast.Constant)):
            return None
        val = lit(v)
        if val is None and isinstance(v, ast.Name) and v.id in values:
            val = values[v.id]
        elif val is None and not isinstance(v, ast.Constant):
            return None
        out[key] = val
    return out


def main():
    tree = ast.parse(open(SRC, encoding="utf-8").read())
    cases, skipped = [], 0

    def emit(fn_name, ca, doc, expect):
        query, special = ca
        case = {"name": fn_name, "query": query, "doc": doc, "expect": expect}
        if special:
            case["special_fields"] = special
        cases.append(case)

    for cls in [n for n in tree.body if isinstance(n, ast.ClassDef)]:
        for fn in [n for n in cls.body if isinstance(n, ast.FunctionDef)]:
            if is_xfail(fn):
                continue
            env = {}      # var name -> (query, special)
            for node in ast.walk(fn):
                if isinstance(node, ast.Assign) and len(node.targets) == 1 \
                        and isinstance(node.targets[0], ast.Name):
                    ca = create_args(node.value)
                    if ca:
                        env[node.targets[0].id] = ca
            # loop-bound values visible to each assert
            loop_vals = {}  # id(assert node) -> {var: value}
            for node in ast.walk(fn):
                if isinstance(node, ast.For) and isinstance(node.target, ast.Name):
                    seq = lit(node.iter)
                    if isinstance(seq, (list, tuple)):
                        for sub in ast.walk(node):
                            if isinstance(sub, ast.Assert):
                                loop_vals.setdefault(id(sub), {})[
                                    node.target.id] = list(seq)
            for node in ast.walk(fn):
                if not isinstance(node, ast.Assert):
                    continue
                test, expect = node.test, True
                if isinstance(test, ast.UnaryOp) and isinstance(test.op, ast.Not):
                    test, expect = test.operand, False
                if not (isinstance(test, ast.Call)
                        and isinstance(test.func, ast.Attribute)
                        and test.func.attr == "matches" and test.args):
                    continue
                target = test.func.value
                ca = create_args(target)
                if ca is None and isinstance(target, ast.Name):
                    ca = env.get(target.id)
                if ca is None:
                    skipped += 1
                    continue
                doc = lit(test.args[0])
                if isinstance(doc, dict):
                    emit(fn.name, ca, doc, expect)
                    continue
                # loop-variable docs: one case per bound value
                bound = loop_vals.get(id(node), {})
                emitted = False
                for var, vals in bound.items():
                    for v in vals:
                        d = doc_with_vars(test.args[0], {var: v})
                        if isinstance(d, dict):
                            emit(fn.name, ca, d, expect)
                            emitted = True
                if not emitted:
                    skipped += 1

    # range suites: @pytest.mark.parametrize((range_expression, matching,
    # non_matching)) methods taking the module's range_query fixture (two
    # query templates, test file lines 28-45). Values outside int64 are
    # skipped — the engine's integer domain is Spark's LongType.
    RANGE_TEMPLATES = ("key:{range_expression}", "key:({range_expression})")
    I64_MIN, I64_MAX = -(2 ** 63), 2 ** 63 - 1

    def in_domain(v):
        return not isinstance(v, int) or isinstance(v, bool) \
            or (I64_MIN <= v <= I64_MAX)

    for cls in [n for n in tree.body if isinstance(n, ast.ClassDef)]:
        for fn in [n for n in cls.body if isinstance(n, ast.FunctionDef)]:
            args = [a.arg for a in fn.args.args]
            if "range_query" not in args or "range_expression" not in args:
                continue
            for dec in fn.decorator_list:
                if not (isinstance(dec, ast.Call) and "parametrize"
                        in ast.unparse(dec.func)):
                    continue
                for p in ast.walk(dec.args[1]):
                    if not (isinstance(p, ast.Call)
                            and "param" in ast.unparse(p.func)):
                        continue
                    vals = [lit(a) for a in p.args]
                    if len(vals) < 3 or not isinstance(vals[0], str):
                        continue
                    expr, match_vals, nomatch_vals = vals[0], vals[1], vals[2]
                    import re as _re
                    if any(not (I64_MIN <= int(m) <= I64_MAX)
                           for m in _re.findall(r"-?\d{19,}", expr)):
                        skipped += 1
                        continue
                    if not isinstance(match_vals, (list, tuple)):
                        match_vals = [match_vals]
                    if not isinstance(nomatch_vals, (list, tuple)):
                        nomatch_vals = [nomatch_vals]
                    for tmpl in RANGE_TEMPLATES:
                        query = tmpl.format(range_expression=expr)
                        for v, expect in [(v, True) for v in match_vals] + \
                                [(v, False) for v in nomatch_vals]:
                            if not in_domain(v):
                                skipped += 1
                                continue
                            emit(fn.name, (query, None),
                                 {"key": v}, expect)

    json.dump(cases, open(OUT, "w", encoding="utf-8"), indent=1)
    print(f"wrote {len(cases)} cases ({skipped} skipped) -> {OUT}")


if __name__ == "__main__":
    main()
