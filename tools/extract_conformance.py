"""Extract golden (rule, input, expected) triples from the reference's
table-driven processor tests into JSON fixtures.

Handles three corpus shapes found in tests/unit/processor/*/test_*.py:
  A. module-level  test_cases = [pytest.param(rule, event, expected, id=...)]
  B. module-level  test_cases = [(name, rule, event, expected), ...]
     (pseudonymizer: 5-tuples with a trailing regex_mapping)
  C. class-level   @pytest.mark.parametrize([names...], [tuples...])
     on a test method whose param names include rule+document/event+expected

Failure cases (failure_test_cases, with a trailing error message) are
extracted too, marked with "error".  Non-literal entries are counted and
skipped.
"""
import ast, glob, json, os, sys

REF = "/root/reference/tests/unit/processor"
OUT = "/root/repo/src/test/resources/conformance"

def lit(node):
    return ast.literal_eval(node)

def from_param_call(call):
    """pytest.param(rule, event, expected[, extra...], id=...)"""
    args = [lit(a) for a in call.args]
    name = None
    for kw in call.keywords:
        if kw.arg == "id":
            name = lit(kw.value)
    return args, name

def classify(args, name):
    """Map a positional tuple to a case dict. Shapes seen:
       (rule, event, expected)                      — pytest.param style
       (name, rule, event, expected)                — tuple style
       (name, rule, event, expected, extra)        — pseudonymizer regex_mapping
       (rule, event, expected, error)               — failure param style
       (name, rule, event, expected, error)         — failure tuple style
    A rule is a dict containing 'filter'."""
    def is_rule(x): return isinstance(x, dict) and "filter" in x
    if len(args) >= 3 and is_rule(args[0]):
        case = {"name": name, "rule": args[0], "input": args[1], "expected": args[2]}
        if len(args) > 3:
            if isinstance(args[3], str): case["error"] = args[3]
            elif args[3] is not None: case["extra"] = args[3]
        return case
    if len(args) >= 4 and isinstance(args[0], str) and is_rule(args[1]):
        case = {"name": args[0], "rule": args[1], "input": args[2], "expected": args[3]}
        if len(args) > 4:
            if isinstance(args[4], str): case["error"] = args[4]
            else: case["extra"] = args[4]
        return case
    return None

def extract_file(path):
    cases, skipped = [], 0
    tree = ast.parse(open(path).read())
    # shapes A & B: module-level assigns
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and isinstance(node.value, ast.List) and \
           any(isinstance(t, ast.Name) and t.id in ("test_cases", "failure_test_cases")
               for t in node.targets):
            failure = any(isinstance(t, ast.Name) and t.id == "failure_test_cases"
                          for t in node.targets)
            for el in node.value.elts:
                try:
                    if isinstance(el, ast.Call):
                        args, name = from_param_call(el)
                    elif isinstance(el, (ast.Tuple, ast.List)):
                        args, name = [lit(x) for x in el.elts], None
                    else:
                        skipped += 1; continue
                    case = classify(args, name)
                    if case is None: skipped += 1; continue
                    if failure and "error" not in case: case["error"] = ""
                    cases.append(case)
                except Exception:
                    skipped += 1
        # shape C: parametrize decorators with inline lists
        if isinstance(node, ast.FunctionDef):
            for dec in node.decorator_list:
                if not (isinstance(dec, ast.Call) and
                        getattr(dec.func, "attr", "") == "parametrize" and
                        len(dec.args) == 2):
                    continue
                try: names = lit(dec.args[0])
                except Exception: continue
                if isinstance(names, str): names = [n.strip() for n in names.split(",")]
                joined = " ".join(names)
                if "rule" not in joined or "expected" not in joined: continue
                if not isinstance(dec.args[1], ast.List): continue
                for el in dec.args[1].elts:
                    try:
                        if isinstance(el, ast.Call):
                            args, name = from_param_call(el)
                        elif isinstance(el, (ast.Tuple, ast.List)):
                            args, name = [lit(x) for x in el.elts], None
                        else:
                            skipped += 1; continue
                        case = classify(args, name)
                        if case is None: skipped += 1; continue
                        cases.append(case)
                    except Exception:
                        skipped += 1
    return cases, skipped

total = 0
summary = {}
for d in sorted(os.listdir(REF)):
    if not os.path.isdir(os.path.join(REF, d)): continue
    cases, skipped = [], 0
    # only the processor behavior files, not rule-validation files
    for f in sorted(glob.glob(f"{REF}/{d}/test_{d}.py")):
        c, s = extract_file(f)
        cases += c; skipped += s
    if cases:
        for i, c in enumerate(cases):
            if not c.get("name"): c["name"] = f"case_{i}"
            c["processor"] = d
        def de_set(o):
            if isinstance(o, set): return sorted(o)
            if isinstance(o, dict): return {k: de_set(v) for k, v in o.items()}
            if isinstance(o, (list, tuple)): return [de_set(x) for x in o]
            return o
        with open(f"{OUT}/{d}.json", "w") as fh:
            json.dump(de_set(cases), fh, indent=1)
        summary[d] = (len(cases), skipped)
        total += len(cases)
print(f"{'processor':28s} {'cases':>5s} {'skipped':>7s}")
for d, (n, s) in summary.items():
    print(f"{d:28s} {n:5d} {s:7d}")
print("TOTAL", total)
