"""MODEL / NEURAL RELATION / TRAIN NEURAL RELATION query-text grammar.

Reference: kolibrie/src/parser.rs:2219-2503 (declaration parsers), AST
shared/src/query.rs:133-202, runtime kolibrie/src/neural_relations.rs:375-553
(``execute_neural_program``: a program is PREFIX lines + any number of
MODEL / NEURAL RELATION / TRAIN declarations + an optional top-level
ML.PREDICT).

Syntax accepted (mirrors the reference's examples, e.g.
kolibrie/examples/sparql_syntax/ml_train/predict_after_train.rs)::

    PREFIX ex: <http://example.org/>

    MODEL "digit_model" {
        ARCH MLP { HIDDEN [16, 8] }
        OUTPUT EXCLUSIVE { "A", "B", "C" }   # or OUTPUT BINARY { "yes" }
    }

    NEURAL RELATION ex:predictedDigit USING MODEL "digit_model" {
        INPUT { ?sample ex:x0 ?x0 . ?sample ex:x1 ?x1 . }
        FEATURES { ?x0, ?x1 }
    }

    TRAIN NEURAL RELATION ex:predictedDigit {
        DATA { ?sample ex:gold ?label . }     # or QUERY { SELECT ... }
        LABEL ?label
        TARGET { ?sample ex:predictedDigit ?label }
        LOSS cross_entropy
        OPTIMIZER adam
        LEARNING_RATE 0.1
        EPOCHS 80
        BATCH_SIZE 4
        SAVE_TO "/path/model.npz"
    }

    ML.PREDICT(MODEL "digit_model", INPUT { SELECT ... }, OUTPUT ?label)

Training collects the (small) labelled feature table to the driver —
like the reference's Candle runtime — while materialization scores the
INPUT bindings distributed (mapInPandas) and inserts the derived facts.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class ModelDecl:
    name: str
    hidden_layers: list[int]
    output_kind: str  # "exclusive" | "binary"
    labels: list[str] = field(default_factory=list)  # exclusive
    positive_literal: str | None = None  # binary


@dataclass
class NeuralRelationDecl:
    predicate: str
    model_name: str
    input_block: str  # raw BGP text
    feature_vars: list[str]
    anchor_var: str


@dataclass
class TrainDecl:
    predicate: str
    data_kind: str  # "pattern" | "query"
    data_block: str
    label_var: str
    target_triple: str
    loss: str
    optimizer: str
    learning_rate: float
    epochs: int
    batch_size: int
    save_path: str | None = None


@dataclass
class NeuralProgram:
    header: str  # PREFIX declarations
    prefixes: dict[str, str]
    models: list[ModelDecl]
    relations: list[NeuralRelationDecl]
    trains: list[TrainDecl]
    ml_predict_text: str | None


def _balanced(text: str, open_ch: str = "{", close_ch: str = "}") -> tuple[str, str]:
    """text starts at/after the opening brace's position: returns
    (inner, rest). Raises ValueError when unbalanced."""
    text = text.lstrip()
    if not text.startswith(open_ch):
        raise ValueError(f"expected {open_ch!r} at {text[:40]!r}")
    depth = 0
    for i, ch in enumerate(text):
        if ch == open_ch:
            depth += 1
        elif ch == close_ch:
            depth -= 1
            if depth == 0:
                return text[1:i], text[i + 1 :]
    raise ValueError(f"unbalanced {open_ch}...{close_ch}")


_PREFIX_RE = re.compile(r"PREFIX\s+([A-Za-z_][\w\-]*)?:\s*<([^<>\s]*)>", re.I)
_QUOTED_RE = re.compile(r'"((?:[^"\\]|\\.)*)"')


def _resolve(term: str, prefixes: dict[str, str]) -> str:
    """Resolve a prefixed name / bracketed IRI to a plain IRI string."""
    term = term.strip()
    if term.startswith("<") and term.endswith(">"):
        return term[1:-1]
    pfx, sep, local = term.partition(":")
    if sep and pfx in prefixes:
        return prefixes[pfx] + local
    return term


def _infer_anchor_var(input_block: str) -> str:
    """First subject-position variable, else first variable anywhere
    (reference infer_anchor_var, parser.rs:2197-2217)."""
    for stmt in re.split(r"\s*\.\s*(?:\n|$)|(?<=\S)\s*\.\s+", input_block):
        stmt = stmt.strip().rstrip(".")
        if not stmt:
            continue
        first = stmt.split()[0]
        if first.startswith(("?", "$")):
            return first.lstrip("?$")
    m = re.search(r"[?$](\w+)", input_block)
    if m:
        return m.group(1)
    raise ValueError("NEURAL RELATION INPUT must contain at least one anchor variable")


def _parse_model_decl(text: str) -> tuple[ModelDecl, str]:
    m = re.match(r'\s*MODEL\s+"([^"]*)"\s*', text)
    if m is None:
        raise ValueError("expected MODEL \"name\" { ... }")
    name = m.group(1)
    body, rest = _balanced(text[m.end():])
    body = body.strip()
    am = re.match(r"ARCH\s+MLP\s*", body)
    if am is None:
        raise ValueError("MODEL body must start with ARCH MLP { HIDDEN [...] }")
    arch_body, after_arch = _balanced(body[am.end():])
    hm = re.match(r"\s*HIDDEN\s*\[([^\]]*)\]\s*$", arch_body.strip())
    if hm is None:
        raise ValueError("ARCH MLP needs HIDDEN [sizes]")
    hidden = [int(v) for v in hm.group(1).split(",") if v.strip()]
    om = re.match(r"\s*OUTPUT\s+(EXCLUSIVE|BINARY)\s*", after_arch)
    if om is None:
        raise ValueError("MODEL needs OUTPUT EXCLUSIVE { ... } or OUTPUT BINARY { ... }")
    labels_body, _ = _balanced(after_arch[om.end():])
    # comma-separated label list: quoted strings, <IRI>s (angle brackets
    # stripped to the store's bracket-free lexical form), or bare tokens —
    # the reference keeps unquoted values verbatim (parser.rs:2178-2195)
    # single alternation pass (quoted | <IRI> | bare) instead of a ','
    # pre-split, so commas inside quoted labels ('"a,b"') stay intact
    values = []
    for lm in re.finditer(r'"((?:[^"\\]|\\.)*)"|<([^>]*)>|([^\s,"<]+)', labels_body):
        if lm.group(1) is not None:
            values.append(lm.group(1))
        elif lm.group(2) is not None:
            values.append(lm.group(2))
        else:
            values.append(lm.group(3))
    if om.group(1) == "EXCLUSIVE":
        decl = ModelDecl(name, hidden, "exclusive", labels=values)
    else:
        if not values:
            raise ValueError("OUTPUT BINARY needs a positive literal")
        decl = ModelDecl(name, hidden, "binary", positive_literal=values[0])
    return decl, rest


def _parse_neural_relation_decl(text: str, prefixes: dict[str, str]) -> tuple[NeuralRelationDecl, str]:
    m = re.match(r'\s*NEURAL\s+RELATION\s+(\S+)\s+USING\s+MODEL\s+"([^"]*)"\s*', text)
    if m is None:
        raise ValueError('expected NEURAL RELATION pred USING MODEL "name" { ... }')
    predicate, model_name = _resolve(m.group(1), prefixes), m.group(2)
    body, rest = _balanced(text[m.end():])
    body = body.strip()
    im = re.match(r"INPUT\s*", body)
    if im is None:
        raise ValueError("NEURAL RELATION body must start with INPUT { patterns }")
    input_block, after_input = _balanced(body[im.end():])
    fm = re.match(r"\s*FEATURES\s*", after_input)
    if fm is None:
        raise ValueError("NEURAL RELATION needs FEATURES { ?v, ... }")
    feat_block, _ = _balanced(after_input[fm.end():])
    feature_vars = [
        v.strip().lstrip("?$") for v in feat_block.split(",") if v.strip()
    ]
    anchor = _infer_anchor_var(input_block)
    return (
        NeuralRelationDecl(predicate, model_name, input_block.strip(), feature_vars, anchor),
        rest,
    )


def _parse_train_decl(text: str, prefixes: dict[str, str]) -> tuple[TrainDecl, str]:
    m = re.match(r"\s*TRAIN\s+NEURAL\s+RELATION\s+(\S+)\s*", text)
    if m is None:
        raise ValueError("expected TRAIN NEURAL RELATION pred { ... }")
    predicate = _resolve(m.group(1), prefixes)
    body, rest = _balanced(text[m.end():])
    body = body.strip()
    dm = re.match(r"(DATA|QUERY)\s*", body)
    if dm is None:
        raise ValueError("TRAIN body must start with DATA { patterns } or QUERY { SELECT ... }")
    data_block, after = _balanced(body[dm.end():])
    kind = "pattern" if dm.group(1) == "DATA" else "query"

    opts: dict[str, str] = {}
    target = None
    # line-based option parsing, like the reference (parser.rs:2436-2465)
    remaining = after
    tm = re.search(r"TARGET\s*\{", remaining)
    if tm:
        tgt_body, tail = _balanced(remaining[tm.end() - 1 :])
        target = tgt_body.strip()
        remaining = remaining[: tm.start()] + tail
    for line in remaining.splitlines():
        line = line.strip()
        if not line:
            continue
        for key in (
            "LABEL", "LOSS", "OPTIMIZER", "LEARNING_RATE", "EPOCHS",
            "BATCH_SIZE", "SAVE_TO",
        ):
            if line.upper().startswith(key):
                opts[key] = line[len(key):].strip()
                break
    missing = [
        k for k in ("LABEL", "LOSS", "OPTIMIZER", "LEARNING_RATE", "EPOCHS", "BATCH_SIZE")
        if k not in opts
    ]
    if missing or target is None:
        need = missing + (["TARGET"] if target is None else [])
        raise ValueError(f"TRAIN NEURAL RELATION missing {', '.join(need)}")
    save = None
    if "SAVE_TO" in opts:
        qm = _QUOTED_RE.search(opts["SAVE_TO"])
        save = qm.group(1) if qm else opts["SAVE_TO"]
    return (
        TrainDecl(
            predicate=predicate,
            data_kind=kind,
            data_block=data_block.strip(),
            label_var=opts["LABEL"].lstrip("?$"),
            target_triple=target,
            loss=opts["LOSS"].lower(),
            optimizer=opts["OPTIMIZER"].lower(),
            learning_rate=float(opts["LEARNING_RATE"]),
            epochs=int(opts["EPOCHS"]),
            batch_size=int(opts["BATCH_SIZE"]),
            save_path=save,
        ),
        rest,
    )


def is_neural_program(text: str) -> bool:
    """True when the text (after PREFIX lines) starts with a MODEL /
    NEURAL RELATION / TRAIN NEURAL RELATION declaration."""
    stripped = re.sub(r"PREFIX\s+\S*\s*<[^>]*>\s*", "", text, flags=re.I).lstrip()
    return bool(
        re.match(r"(MODEL\s+\"|NEURAL\s+RELATION\s|TRAIN\s+NEURAL\s+RELATION\s)", stripped)
    )


def parse_neural_program(text: str) -> NeuralProgram:
    prefixes = {m.group(1) or "": m.group(2) for m in _PREFIX_RE.finditer(text)}
    header_lines = [
        line for line in text.splitlines() if line.strip().upper().startswith("PREFIX")
    ]
    body = "\n".join(
        line for line in text.splitlines()
        if not line.strip().upper().startswith("PREFIX")
    )
    models, relations, trains = [], [], []
    rest = body
    while True:
        stripped = rest.lstrip()
        if stripped.startswith("MODEL"):
            decl, rest = _parse_model_decl(stripped)
            models.append(decl)
        elif stripped.startswith("NEURAL RELATION"):
            decl, rest = _parse_neural_relation_decl(stripped, prefixes)
            relations.append(decl)
        elif stripped.startswith("TRAIN NEURAL RELATION"):
            decl, rest = _parse_train_decl(stripped, prefixes)
            trains.append(decl)
        else:
            break
    tail = rest.strip()
    ml_predict = tail if tail.upper().startswith("ML.PREDICT") else None
    if tail and ml_predict is None:
        raise ValueError(
            "neural programs accept only MODEL / NEURAL RELATION / "
            f"TRAIN NEURAL RELATION declarations and top-level ML.PREDICT, got {tail[:60]!r}"
        )
    return NeuralProgram(
        header="\n".join(header_lines),
        prefixes=prefixes,
        models=models,
        relations=relations,
        trains=trains,
        ml_predict_text=ml_predict,
    )


def execute_neural_program(engine, text: str):
    """Reference execute_neural_program (neural_relations.rs:375-553):
    register declarations, run trainings (materializing predictions as
    predicate facts), then run the optional trailing ML.PREDICT and return
    its DataFrame (None otherwise)."""
    from kolibrie_spark.ml.neural import MLPClassifier

    prog = parse_neural_program(text)
    for md in prog.models:
        engine.ml_model_decls[md.name] = md
    for nr in prog.relations:
        engine.neural_relation_decls[nr.predicate] = nr
    for tr in prog.trains:
        nr = engine.neural_relation_decls.get(tr.predicate)
        if nr is None:
            raise ValueError(f"TRAIN references undeclared NEURAL RELATION {tr.predicate!r}")
        md = engine.ml_model_decls.get(nr.model_name)
        if md is None:
            raise ValueError(f"NEURAL RELATION references undeclared MODEL {nr.model_name!r}")

        # labelled training table: INPUT patterns ⋈ DATA patterns
        if tr.data_kind == "pattern":
            select = (
                f"{prog.header}\nSELECT ?{nr.anchor_var} "
                + " ".join(f"?{v}" for v in nr.feature_vars)
                + f" ?{tr.label_var} WHERE {{ {nr.input_block} {tr.data_block} }}"
            )
        else:
            select = f"{prog.header}\n{tr.data_block}"
        train_df = engine.query(select)
        pdf = train_df.toPandas()
        model = MLPClassifier(
            hidden_layers=md.hidden_layers,
            labels=md.labels if md.output_kind == "exclusive" else None,
            positive_literal=md.positive_literal,
            lr=tr.learning_rate,
            epochs=tr.epochs,
            optimizer=tr.optimizer,
        )
        X = pdf[nr.feature_vars].astype(float).to_numpy()
        model.fit(X, pdf[tr.label_var].tolist())
        engine.models[nr.model_name] = model
        if tr.save_path:
            model.save(tr.save_path)
        _materialize_relation(engine, prog, nr, model)
    if prog.ml_predict_text is not None:
        return engine.ml_predict(prog.header + "\n" + prog.ml_predict_text)
    return None


def _materialize_relation(engine, prog: NeuralProgram, nr: NeuralRelationDecl, model):
    """Score the INPUT bindings distributed and insert (anchor, predicate,
    label) facts (reference materialize_neural_relation,
    neural_relations.rs:472-537; binary keeps only >= 0.5 positives)."""
    from pyspark.sql import functions as F

    from kolibrie_spark.ml.predict import run_ml_predict

    select = (
        f"{prog.header}\nSELECT ?{nr.anchor_var} "
        + " ".join(f"?{v}" for v in nr.feature_vars)
        + f" WHERE {{ {nr.input_block} }}"
    )
    inputs = engine.query(select)
    scored = run_ml_predict(inputs, model, "__label")
    facts = scored.filter(F.col("__label") != "").select(
        F.col(nr.anchor_var).cast("string").alias("s"),
        F.lit(nr.predicate).alias("p"),
        F.col("__label").cast("string").alias("o"),
        F.lit(None).cast("string").alias("g"),
    )
    engine.store.insert(facts)
    engine.neural_materialized[nr.predicate] = facts.count()
