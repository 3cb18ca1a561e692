#!/usr/bin/env python3
"""Driver-side amides model exporter (NOT a library dependency).

Reads the reference's pickled sklearn model archive
(/root/reference/tests/testdata/unit/amides/model.zip — TfidfVectorizer
+ linear-kernel SVC + MinMaxScaler per model, one misuse model plus 15
rule-attribution models) WITHOUT sklearn/joblib/scipy: a permissive
unpickler stubs the sklearn classes and reads joblib's inline raw numpy
array bytes directly. Collapses each linear SVC to a dense weight
vector (w = dual_coef @ support_vectors) and writes

  src/test/resources/amides/scored_model.json   (engine artifact)
  src/test/resources/amides/scored_fixtures.json (golden scores)

The fixture scores are computed here with the exact reference math
(normalize -> tf -> idf -> l2 -> w.x+b -> minmax -> round 3,
amides/detection.py:46-98, normalize.py:36-60) and sanity-pinned
against the reference test suite's threshold assertions
(tests/unit/processor/amides/test_amides.py:37-80: the malicious
cmdline scores >= 0.32, the benign one < 0.32).
"""
import zipfile, pickle, io, json, re, sys, os
import numpy as np

REF = "/root/reference/tests/testdata/unit/amides/model.zip"
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "amides")


class NumpyArrayWrapper:
    def read(self, fh):
        dtype = self.dtype if hasattr(self.dtype, "itemsize") else np.dtype(self.dtype)
        if getattr(dtype, "hasobject", False):
            return pickle.load(fh)
        if getattr(self, "numpy_array_alignment_bytes", None) is not None:
            padding_length = int.from_bytes(fh.read(1), "little")
            fh.read(padding_length)
        count = int(np.prod(self.shape)) if self.shape else 1
        data = fh.read(count * dtype.itemsize)
        arr = np.frombuffer(data, dtype=dtype)
        return arr.reshape(self.shape, order=getattr(self, "order", "C"))


class StubBase:
    def __setstate__(self, state):
        self.__dict__["_state"] = state


_stubs = {}


def make_stub(module, name):
    key = f"{module}.{name}"
    if key not in _stubs:
        _stubs[key] = type(name, (StubBase,), {"_cls": key})
    return _stubs[key]


class JoblibUnpickler(pickle._Unpickler):
    def __init__(self, fh):
        super().__init__(fh)
        self.fh = fh

    def find_class(self, module, name):
        if name in ("NumpyArrayWrapper", "NDArrayWrapper"):
            return NumpyArrayWrapper
        try:
            return super().find_class(module, name)
        except Exception:
            return make_stub(module, name)

    def load_build(self):
        pickle._Unpickler.load_build(self)
        if isinstance(self.stack[-1], NumpyArrayWrapper):
            self.stack.append(self.stack.pop().read(self.fh))

    dispatch = pickle._Unpickler.dispatch.copy()
    dispatch[pickle.BUILD[0]] = load_build


def csr_to_dense(stub):
    st = stub.__dict__["_state"]
    shape = st["_shape"]
    dense = np.zeros(shape)
    indptr, indices, data = st["indptr"], st["indices"], st["data"]
    for row in range(shape[0]):
        for k in range(indptr[row], indptr[row + 1]):
            dense[row, indices[k]] = data[k]
    return dense


def export_model(m):
    v = m["vectorizer"].__dict__["_state"]
    clf = m["clf"].__dict__["_state"]
    scaler = m["scaler"].__dict__["_state"]
    vocab = {t: int(i) for t, i in v["vocabulary_"].items()}
    idf_diag = csr_to_dense(v["_tfidf"].__dict__["_state"]["_idf_diag"])
    idf = np.diag(idf_diag)
    sv = csr_to_dense(clf["support_vectors_"])
    dual = csr_to_dense(clf["dual_coef_"]).reshape(1, -1)
    w = (dual @ sv).ravel()
    # the public (dual_coef_, intercept_) pair IS the decision_function
    # orientation for binary SVC (sklearn flips the internal libsvm
    # _dual_coef_/_intercept_ signs into these); sign pinned below
    # against the reference suite's threshold assertions.
    intercept = float(np.asarray(clf["intercept_"]).ravel()[0])
    return {
        "tokens": {t: [float(idf[i]), float(w[i])] for t, i in vocab.items()},
        "intercept": intercept,
        "scaler_scale": float(np.asarray(scaler["scale_"]).ravel()[0]),
        "scaler_min": float(np.asarray(scaler["min_"]).ravel()[0]),
    }


DUMMY_RE = re.compile(r"[\"\^`\u2019]")
NUM_RE = re.compile(r"^(?:0x)?[0-9a-f]{4,}$")  # max_num_values_length=3


def normalize(cmdline):
    s = DUMMY_RE.sub("", cmdline).lower()
    tokens = re.findall(r"\w+", s)
    tokens = [t for t in tokens if not NUM_RE.match(t) and len(t) <= 30]
    return sorted(tokens)


def score(model, tokens):
    tf = {}
    for t in tokens:
        if t in model["tokens"]:
            tf[t] = tf.get(t, 0) + 1
    if tf:
        vec = {t: n * model["tokens"][t][0] for t, n in tf.items()}
        norm = np.sqrt(sum(x * x for x in vec.values()))
        dot = sum(x * model["tokens"][t][1] for t, x in vec.items()) / norm
    else:
        dot = 0.0
    raw = dot + model["intercept"]
    return round(raw * model["scaler_scale"] + model["scaler_min"], 3)


def main():
    z = zipfile.ZipFile(REF)
    models = JoblibUnpickler(io.BytesIO(z.read("model"))).load()
    artifact = {
        "misuse": export_model(models["single"]),
        "rules": {name: export_model(m) for name, m in models["multi"].items()},
    }

    cmdlines = [
        "cmd.exe /c taskkill.exe /im cmd.exe",                      # ref: malicious
        "C:\\Windows\\system32\\svchost.exe -k DcomLaunch",         # ref: benign
        'reg.exe save hklm\\sam %temp%\\sam',
        "powershell.exe -ExecutionPolicy Bypass -File script.ps1",
        'wmic process call create "rundll32.exe"',
        "C:\\Program Files\\Mozilla Firefox\\firefox.exe",
        "whoami /all",
        "net user administrator /active:yes",
        "notepad.exe C:\\Users\\user\\notes.txt",
        "schtasks /create /tn updater /tr evil.exe /sc minute",
    ]
    fixtures = []
    for c in cmdlines:
        toks = normalize(c)
        conf = score(artifact["misuse"], toks)
        attributions = sorted(
            ({"rule": name, "confidence": score(m, toks)}
             for name, m in artifact["rules"].items()),
            key=lambda a: -a["confidence"])[:10]
        fixtures.append({"cmdline": c, "normalized": ",".join(toks),
                         "confidence": conf, "attributions": attributions})

    # pin the decision-function sign against the reference's own suite
    mal = fixtures[0]["confidence"]
    ben = fixtures[1]["confidence"]
    assert mal >= 0.32, f"malicious fixture scored {mal}, expected >= 0.32"
    assert ben < 0.32, f"benign fixture scored {ben}, expected < 0.32"

    os.makedirs(OUT_DIR, exist_ok=True)
    with open(os.path.join(OUT_DIR, "scored_model.json"), "w") as f:
        json.dump(artifact, f)
    with open(os.path.join(OUT_DIR, "scored_fixtures.json"), "w") as f:
        json.dump(fixtures, f, indent=1)
    print(f"misuse vocab: {len(artifact['misuse']['tokens'])} tokens; "
          f"{len(artifact['rules'])} rule models")
    print(f"malicious={mal} benign={ben}")
    for fx in fixtures:
        print(f"  {fx['confidence']:6.3f}  {fx['cmdline'][:60]}")


if __name__ == "__main__":
    main()
