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

# ---------------------------------------------------------------------------
# Shape D: method-body tests — local literal rule/document/expected vars,
# `self._load_rule(rule)` + `self.object.process(document)` + asserts.
# Covers the 12 processors whose reference suites are not table-driven:
# full-equality asserts, path-level asserts (document["a"]["b"] == x,
# .get chains, `in`/`not in`, `is None`), parametrize expansion over
# method args, labeler schema fixtures, socket.gethostbyname mock returns,
# and CONFIG-default rules loaded from the testdata rules dirs.
# ---------------------------------------------------------------------------
import copy
import yaml

METHOD_PROCS = {
    "labeler", "clusterer", "template_replacer", "selective_extractor",
    "datetime_extractor", "dropper", "deleter", "generic_resolver",
    "domain_label_extractor", "domain_resolver", "geoip_enricher", "amides",
}

class Unresolvable(Exception):
    pass

def resolve(node, env):
    if isinstance(node, ast.Constant):
        return node.value
    if isinstance(node, ast.Name):
        if node.id in env:
            return copy.deepcopy(env[node.id])
        raise Unresolvable(node.id)
    if isinstance(node, ast.Dict):
        out = {}
        for k, v in zip(node.keys, node.values):
            if k is None:                       # {**splat}
                sp = resolve(v, env)
                if not isinstance(sp, dict):
                    raise Unresolvable("splat")
                out.update(sp)
            else:
                out[resolve(k, env)] = resolve(v, env)
        return out
    if isinstance(node, (ast.List, ast.Tuple)):
        return [resolve(x, env) for x in node.elts]
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
        return -resolve(node.operand, env)
    if isinstance(node, ast.JoinedStr):
        parts = []
        for v in node.values:
            if isinstance(v, ast.Constant):
                parts.append(str(v.value))
            elif isinstance(v, ast.FormattedValue):
                parts.append(str(resolve(v.value, env)))
            else:
                raise Unresolvable("fstring")
        return "".join(parts)
    if isinstance(node, ast.Call):
        fn = node.func
        name = fn.id if isinstance(fn, ast.Name) else getattr(fn, "attr", "")
        if name in ("deepcopy", "copy") and node.args:
            return resolve(node.args[0], env)
        if name == "create_from_dict" and node.args:  # Rule objects ≡ dicts
            return resolve(node.args[0], env)
        if name == "str" and node.args:               # str(tmp_path / "f")
            return str(resolve(node.args[0], env))
    if isinstance(node, ast.BinOp) and isinstance(node.op, ast.Add):
        return resolve(node.left, env) + resolve(node.right, env)
    if isinstance(node, ast.BinOp) and isinstance(node.op, ast.Div):
        # pathlib: tmp_path / "rule.json"
        l, r = resolve(node.left, env), resolve(node.right, env)
        if isinstance(l, str) and isinstance(r, str):
            return l.rstrip("/") + "/" + r
        raise Unresolvable("div")
    raise Unresolvable(type(node).__name__)

def doc_path(node):
    """`document["a"]["b"]` / `document.get("a", {}).get("b")` chains →
    (root var name, [path segs]); None if it isn't such a chain."""
    segs, cur = [], node
    while True:
        if isinstance(cur, ast.Subscript):
            if not isinstance(cur.slice, ast.Constant):
                return None
            segs.append(cur.slice.value)
            cur = cur.value
        elif (isinstance(cur, ast.Call) and isinstance(cur.func, ast.Attribute)
              and cur.func.attr == "get" and cur.args
              and isinstance(cur.args[0], ast.Constant)):
            segs.append(cur.args[0].value)
            cur = cur.func.value
        elif isinstance(cur, ast.Name):
            return cur.id, list(reversed(segs))
        else:
            return None

def extract_fixtures(tree):
    """pytest.fixture functions building a LabelingSchema via
    ingest_schema({...literal}) → {fixture_name: schema_dict}."""
    out = {}
    for node in ast.walk(tree):
        if not isinstance(node, ast.FunctionDef):
            continue
        fixname = None
        for dec in node.decorator_list:
            if (isinstance(dec, ast.Call)
                    and getattr(dec.func, "attr", getattr(dec.func, "id", "")) == "fixture"):
                fixname = node.name
                for kw in dec.keywords:
                    if kw.arg == "name" and isinstance(kw.value, ast.Constant):
                        fixname = kw.value.value
        if fixname is None:
            continue
        for sub in ast.walk(node):
            if (isinstance(sub, ast.Call) and isinstance(sub.func, ast.Attribute)
                    and sub.func.attr == "ingest_schema" and sub.args):
                try:
                    out[fixname] = lit(sub.args[0])
                except Exception:
                    pass
    return out

def load_default_rules(config):
    """Inline every rule from the CONFIG's testdata rules dirs."""
    rules = []
    for d in config.get("rules", []):
        base = os.path.join("/root/reference", d)
        for f in sorted(glob.glob(f"{base}/*")):
            try:
                with open(f) as fh:
                    docs = list(yaml.safe_load_all(fh))  # multi-doc YAML
            except Exception:
                continue
            for data in docs:
                if isinstance(data, dict):
                    data = [data]
                for r in data or []:
                    if isinstance(r, dict) and "filter" in r:
                        rules.append(r)
    return rules

def module_env(tree):
    """Module-level literal assigns (timestamp constants etc.)."""
    env = {}
    for node in tree.body:
        if isinstance(node, ast.Assign) and len(node.targets) == 1 \
                and isinstance(node.targets[0], ast.Name):
            try:
                env[node.targets[0].id] = resolve(node.value, {})
            except Exception:
                pass
    return env

def method_variants(fn, menv):
    """Expand @pytest.mark.parametrize over the method's own args.
    Returns a list of (variant_id, env_preset); [(None, {})] if none."""
    for dec in fn.decorator_list:
        if not (isinstance(dec, ast.Call)
                and getattr(dec.func, "attr", "") == "parametrize"
                and len(dec.args) == 2):
            continue
        try:
            names = lit(dec.args[0])
        except Exception:
            try:
                names = resolve(dec.args[0], menv)
            except Unresolvable:
                return None
        if isinstance(names, str):
            names = [n.strip() for n in names.split(",")]
        src = dec.args[1]
        if isinstance(src, ast.Name):
            src_list = menv.get("__raw__", {}).get(src.id)
            if src_list is None:
                return None
            elts = src_list
        elif isinstance(src, ast.List):
            elts = src.elts
        else:
            return None
        variants = []
        for el in elts:
            try:
                if isinstance(el, ast.Call):      # pytest.param(...)
                    args = [lit(a) for a in el.args]
                    vid = None
                    for kw in el.keywords:
                        if kw.arg == "id":
                            vid = lit(kw.value)
                elif isinstance(el, (ast.Tuple, ast.List)):
                    args, vid = [lit(x) for x in el.elts], None
                else:
                    args, vid = [lit(el)], None
            except Exception:
                continue
            if len(args) < len(names):
                continue
            variants.append((vid, dict(zip(names, args))))
        return variants
    return [(None, {})]

def mock_returns(fn):
    """@mock.patch("socket.gethostbyname", return_value=X) → {"dns": X}.
    Any other mock.patch decorator disqualifies the method."""
    extra, ok = {}, True
    for dec in fn.decorator_list:
        if (isinstance(dec, ast.Call)
                and getattr(dec.func, "attr", "") == "patch"
                and dec.args and isinstance(dec.args[0], ast.Constant)):
            target = dec.args[0].value
            rv = None
            side_effect = any(kw.arg == "side_effect" for kw in dec.keywords)
            for kw in dec.keywords:
                if kw.arg == "return_value":
                    try:
                        rv = lit(kw.value)
                    except Exception:
                        ok = False
            if side_effect:
                ok = False              # raises instead of returning
            elif target == "socket.gethostbyname" and rv is not None:
                extra["dns"] = rv
            else:
                ok = False
    return extra, ok

def flatten_stmts(stmts):
    """Statement stream in order, descending into `with` blocks (mock
    contexts are transparent for our purposes). Control flow (if/for/
    try/while) poisons the method."""
    out = []
    for s in stmts:
        if isinstance(s, ast.With):
            # with mock.patch("socket.gethostbyname", return_value=X):
            for item in s.items:
                c = item.context_expr
                if (isinstance(c, ast.Call)
                        and getattr(c.func, "attr", "") == "patch"
                        and c.args and isinstance(c.args[0], ast.Constant)
                        and c.args[0].value == "socket.gethostbyname"):
                    for kw in c.keywords:
                        if kw.arg == "return_value":
                            try:
                                out.append(("dns", lit(kw.value)))
                            except Exception:
                                pass
            out.extend(flatten_stmts(s.body))
        elif isinstance(s, (ast.If, ast.For, ast.While, ast.Try)):
            out.append(("poison", None))
        else:
            out.append(("stmt", s))
    return out

def extract_method(fn, menv, fixtures, default_rules, preset, extra0):
    """One parametrize variant of one test method → list of case dicts."""
    env = dict(menv)
    env.update(preset)
    env["tmp_path"] = "__TMP__"   # pathlib joins resolve to marker paths
    segments, rules_loaded, schema_extra = [], [], None
    popped = {}          # var name → key popped off the document
    file_content = None  # json.dumps(...) written to a tmp_path file
    cur = None
    for kind, s in flatten_stmts(fn.body):
        if kind == "poison":
            return []
        if kind == "dns":
            extra0 = dict(extra0)
            extra0["dns"] = s
            continue
        if isinstance(s, ast.Assign) and len(s.targets) == 1 \
                and isinstance(s.targets[0], ast.Name):
            # tags = document.pop("tags") → exclude the key from the full
            # compare; a later `assert set(tags) == set(expected)` becomes
            # an order-insensitive path assert
            v = s.value
            if cur is not None and isinstance(v, ast.Call) \
                    and isinstance(v.func, ast.Attribute) and v.func.attr == "pop" \
                    and isinstance(v.func.value, ast.Name) \
                    and v.func.value.id == cur["doc"] \
                    and v.args and isinstance(v.args[0], ast.Constant):
                cur.setdefault("ignore", []).append(v.args[0].value)
                popped[s.targets[0].id] = v.args[0].value
                continue
            try:
                env[s.targets[0].id] = resolve(s.value, env)
            except Unresolvable:
                env.pop(s.targets[0].id, None)
            continue
        if isinstance(s, ast.Assign):
            # self.object = Factory.create(modified config): the processor
            # under test no longer matches CONFIG — bail. Deeper attribute
            # assigns (metric resets etc.) are harmless.
            for t in s.targets:
                if isinstance(t, ast.Attribute) and t.attr == "object" \
                        and isinstance(t.value, ast.Name) and t.value.id == "self":
                    return []
            continue
        if isinstance(s, ast.Expr) and isinstance(s.value, ast.Call):
            call = s.value
            attr = getattr(call.func, "attr", "")
            if attr in ("write", "write_text") and call.args:
                # stream.write(json.dumps(X)) into a tmp_path file → the
                # harness recreates the file from extra.file_content
                a = call.args[0]
                if isinstance(a, ast.Call) and getattr(a.func, "attr", "") == "dumps" \
                        and a.args:
                    try:
                        file_content = resolve(a.args[0], env)
                    except Unresolvable:
                        pass
                continue
            if attr == "update":
                return []   # config.update(...) → processor ≠ CONFIG
            if attr == "add" and isinstance(call.func, ast.Attribute) \
                    and isinstance(call.func.value, ast.Name) \
                    and call.func.value.id == "responses":
                return []   # per-call mocked HTTP bodies (refresh tests)
            if attr in ("_load_rule", "add_rule") and call.args:
                try:
                    rules_loaded.append(resolve(call.args[0], env))
                except Unresolvable:
                    return []
                if attr == "_load_rule" and len(call.args) > 1 \
                        and isinstance(call.args[1], ast.Name):
                    schema_extra = fixtures.get(call.args[1].id)
                    if schema_extra is None:
                        return []
                continue
            # clusterer drives `self.object._cluster(document, rule)`
            # directly — same segment shape as process()
            if attr in ("process", "_cluster") and call.args \
                    and isinstance(call.args[0], ast.Name):
                nm = call.args[0].id
                if nm not in env or not isinstance(env[nm], dict):
                    return []
                cur = {"doc": nm, "input": copy.deepcopy(env[nm]),
                       "rules": list(rules_loaded) if rules_loaded else None,
                       "expected": None, "paths": []}
                segments.append(cur)
                continue
            continue
        # result = self.object.process(document) — same as bare process
        if isinstance(s, ast.Assign):
            continue
        if isinstance(s, ast.Assert) and cur is not None:
            t = s.test
            if isinstance(t, ast.UnaryOp) and isinstance(t.op, ast.Not):
                if isinstance(t.operand, ast.Name) and t.operand.id == cur["doc"]:
                    cur["expected"] = {}
                    continue
                dp = doc_path(t.operand)      # assert not document.get("x")
                if dp and dp[0] == cur["doc"] and dp[1]:
                    cur["paths"].append({"path": dp[1], "absent": True})
                continue
            if not isinstance(t, ast.Compare) or len(t.ops) != 1:
                continue
            op, left, right = t.ops[0], t.left, t.comparators[0]
            # assert set(tags) == set(expected_tags) on a popped key
            def set_arg(n):
                if isinstance(n, ast.Call) and getattr(n.func, "id", "") == "set" \
                        and n.args and isinstance(n.args[0], ast.Name):
                    return n.args[0].id
                return None
            if isinstance(op, ast.Eq) and set_arg(left) in popped:
                other = set_arg(right)
                try:
                    vals = resolve(ast.Name(id=other), env) if other else None
                except Unresolvable:
                    vals = None
                if vals is not None:
                    cur["paths"].append(
                        {"path": [popped[set_arg(left)]], "set": vals})
                continue
            if isinstance(op, ast.Eq):
                for a, b in ((left, right), (right, left)):
                    if isinstance(a, ast.Name) and a.id == cur["doc"]:
                        try:
                            cur["expected"] = resolve(b, env)
                        except Unresolvable:
                            pass
                        break
                    dp = doc_path(a)
                    if dp and dp[0] == cur["doc"] and dp[1]:
                        try:
                            cur["paths"].append(
                                {"path": dp[1], "value": resolve(b, env)})
                        except Unresolvable:
                            pass
                        break
            elif isinstance(op, ast.Is) and isinstance(right, ast.Constant) \
                    and right.value is None:
                dp = doc_path(left)
                if dp and dp[0] == cur["doc"] and dp[1]:
                    cur["paths"].append({"path": dp[1], "absent": True})
            elif isinstance(op, ast.IsNot) and isinstance(right, ast.Constant) \
                    and right.value is None:
                dp = doc_path(left)
                if dp and dp[0] == cur["doc"] and dp[1]:
                    cur["paths"].append({"path": dp[1], "present": True})
            elif isinstance(op, (ast.In, ast.NotIn)) \
                    and isinstance(left, ast.Constant) \
                    and isinstance(left.value, str):
                dp = doc_path(right)
                if dp is not None and dp[0] == cur["doc"]:
                    key = "absent" if isinstance(op, ast.NotIn) else "present"
                    cur["paths"].append(
                        {"path": dp[1] + [left.value], key: True})
    # a locally-built processor config ({name: {type: proc, ...}}) carries
    # processor-level options (e.g. tagging_field_name) — lift them into
    # the case's extra.config
    local_config = None
    for v in env.values():
        if isinstance(v, dict) and len(v) == 1:
            inner = next(iter(v.values()))
            if isinstance(inner, dict) and inner.get("type"):
                local_config = {k2: v2 for k2, v2 in inner.items()
                                if k2 not in ("type", "rules", "tree_config")}
    if local_config is not None:
        extra0 = dict(extra0)
        extra0["config"] = local_config
    out = []
    for i, seg in enumerate(segments):
        if seg["expected"] is None and not seg["paths"]:
            continue
        rules = seg["rules"] if seg["rules"] is not None else default_rules
        if not rules:
            continue
        # rules referencing tmp_path files need the captured content
        if "__TMP__" in json.dumps(rules, default=str) and file_content is None:
            continue
        case = {"input": seg["input"]}
        if len(rules) == 1:
            case["rule"] = rules[0]
        else:
            case["rules"] = rules
        if seg["expected"] is not None:
            case["expected"] = seg["expected"]
        if seg["paths"]:
            case["expected_paths"] = seg["paths"]
        if seg.get("ignore"):
            case["ignore"] = seg["ignore"]
        ex = dict(extra0)
        if schema_extra is not None:
            ex["schema"] = schema_extra
        if file_content is not None and "__TMP__" in json.dumps(rules, default=str):
            ex["file_content"] = file_content
        if ex:
            case["extra"] = ex
        suffix = f"#{i + 1}" if len(segments) > 1 else ""
        case["__suffix"] = suffix
        out.append(case)
    return out

def extract_method_file(path, proc):
    tree = ast.parse(open(path).read())
    fixtures = extract_fixtures(tree)
    menv = module_env(tree)
    # raw module-level assign nodes for parametrize lists of pytest.param
    raw = {}
    for node in tree.body:
        if isinstance(node, ast.Assign) and len(node.targets) == 1 \
                and isinstance(node.targets[0], ast.Name) \
                and isinstance(node.value, ast.List):
            raw[node.targets[0].id] = node.value.elts
    menv["__raw__"] = raw
    cases, skipped = [], 0
    for node in ast.walk(tree):
        if not isinstance(node, ast.ClassDef):
            continue
        config = {}
        for stmt in node.body:
            if isinstance(stmt, ast.Assign) and len(stmt.targets) == 1 \
                    and isinstance(stmt.targets[0], ast.Name):
                if stmt.targets[0].id == "CONFIG":
                    try:
                        config = lit(stmt.value)
                    except Exception:
                        pass
                elif isinstance(stmt.value, ast.List):
                    # class-level parametrize source lists (amides)
                    raw[stmt.targets[0].id] = stmt.value.elts
        default_rules = load_default_rules(config)
        conf_extra = {k: v for k, v in config.items()
                      if k not in ("type", "rules", "tree_config")}
        for fn in node.body:
            if not isinstance(fn, ast.FunctionDef) or not fn.name.startswith("test_"):
                continue
            mrets, ok = mock_returns(fn)
            if not ok:
                skipped += 1
                continue
            argnames = [a.arg for a in fn.args.args[1:]]
            variants = method_variants(fn, menv)
            if variants is None:
                skipped += 1
                continue
            got_any = False
            for vid, preset in variants:
                extra0 = dict(mrets)
                if conf_extra:
                    extra0["config"] = conf_extra
                for c in extract_method(fn, menv, fixtures, default_rules,
                                        preset, extra0):
                    nm = fn.name[len("test_"):]
                    if vid:
                        nm += f"[{vid}]"
                    c["name"] = nm + c.pop("__suffix")
                    cases.append(c)
                    got_any = True
            if not got_any:
                skipped += 1
    return cases, skipped

total = 0
summary = {}
for d in sorted(os.listdir(REF)):
    if not os.path.isdir(os.path.join(REF, d)): continue
    cases, skipped = [], 0
    # only the processor behavior files, not rule-validation files
    for f in sorted(glob.glob(f"{REF}/{d}/test_{d}.py")):
        if d in METHOD_PROCS:
            c, s = extract_method_file(f, d)
        else:
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
