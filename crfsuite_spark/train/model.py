"""CRF model artifact: two weight tables + label manifest.

The reference persists a binary model file (magic 'lCRF',
src/crf/src/crf1d_model.c:43-75) holding state features
(attribute→label) and transition features (label→label) plus interned
string dictionaries. Our artifact is the same information as open
tables — exactly the shape ``coefficients.crf`` exposes (R/coef.R:3-18):

- ``states(attribute: string, label: string, weight: double)``
- ``transitions(from_label: string, to_label: string, weight: double)``
- ``labels.json`` manifest (ordered label list + metadata)

written as Parquet via pyarrow (a directory, readable by
spark.read.parquet), loaded driver-side into dense numpy matrices and
broadcast to executors — the Spark analogue of the reference's mmap'd
model with O(1) CQDB lookups (crf1d_model.c, crf1d.h:336-350).

Zero-weight features are pruned at save like crf1de_save_model
(crf1d_encode.c:582-618).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd


@dataclass
class CRFModel:
    labels: list[str]  # id -> label string
    attrs: list[str]  # id -> attribute string
    state_w: np.ndarray  # [A, L] dense; zero where no feature
    trans_w: np.ndarray  # [L, L]
    meta: dict = field(default_factory=dict)
    # real-valued attributes (the reference's `embeddings` matrix,
    # R/modelling.R:131-139 / rcpp_crfsuite.cpp:91-99): one named
    # dimension per column, state score contribution E[t] @ emb_w.
    # Mathematically identical to the reference's (colname, value)
    # attributes, stored dense because the vectors are dense.
    emb_names: list[str] = field(default_factory=list)
    emb_w: np.ndarray | None = None  # [D, L]

    @property
    def attr2id(self) -> dict[str, int]:
        return {a: i for i, a in enumerate(self.attrs)}

    def attr_hash_table(self, spark, basis: str = "string") -> tuple[np.ndarray, np.ndarray]:
        """(sorted xxhash64 of attrs, attr-row index per sorted slot).

        Decode hashes attribute strings JVM-side (``xxhash64``) before
        they ever shuffle, so executors look features up by int64 via
        ``np.searchsorted`` — the Spark analogue of the reference's
        CQDB string→id hash lookup (src/cqdb/src/cqdb.c,
        crf1d_model.c). Hashes must come from the same Spark
        implementation both sides, hence the one tiny driver job here
        (cached on the model). A 64-bit collision among model
        attributes is astronomically unlikely; we fail loudly if the
        sky falls.

        ``basis="string"`` hashes the full attribute string (for attrs
        columns holding ``name=value`` strings); ``basis="pair"``
        splits at the first '=' and hashes ``xxhash64(name, value)``
        (``xxhash64(attr)`` when there is no '='), matching
        ``cbind_attribute_hashes`` which never builds the strings.
        """
        caches = getattr(self, "_attr_hash_cache", None)
        if caches is None or not isinstance(caches, dict):
            caches = {}
            self._attr_hash_cache = caches
        if basis not in caches:
            from pyspark.sql import functions as F

            if basis == "string":
                df = spark.createDataFrame(pd.DataFrame({"a": self.attrs}))
                hashed = df.select(F.xxhash64("a"))
            elif basis == "pair":
                split = [a.split("=", 1) for a in self.attrs]
                df = spark.createDataFrame(pd.DataFrame({
                    "n": [s[0] for s in split],
                    "v": [s[1] if len(s) == 2 else None for s in split],
                }))
                hashed = df.select(
                    F.when(F.col("v").isNull(), F.xxhash64("n"))
                    .otherwise(F.xxhash64("n", "v"))
                )
            else:
                raise ValueError(f"unknown hash basis {basis!r}")
            h = np.fromiter(
                (r[0] for r in hashed.collect()),
                dtype=np.int64, count=len(self.attrs),
            )
            order = np.argsort(h, kind="stable").astype(np.int64)
            sh = h[order]
            if len(sh) > 1 and (sh[1:] == sh[:-1]).any():
                raise ValueError("xxhash64 collision among model attributes")
            caches[basis] = (sh, order)
        return caches[basis]

    @property
    def label2id(self) -> dict[str, int]:
        return {l: i for i, l in enumerate(self.labels)}

    # --- S7 coefficient extraction (R/coef.R:3-18) ---
    def coefficients(self) -> tuple[pd.DataFrame, pd.DataFrame]:
        """(states, transitions) sorted by weight desc, zero-weights pruned."""
        a_idx, l_idx = np.nonzero(self.state_w)
        states = pd.DataFrame({
            "attribute": [self.attrs[i] for i in a_idx],
            "label": [self.labels[j] for j in l_idx],
            "weight": self.state_w[a_idx, l_idx],
        }).sort_values("weight", ascending=False, kind="stable").reset_index(drop=True)
        f_idx, t_idx = np.nonzero(self.trans_w)
        trans = pd.DataFrame({
            "from_label": [self.labels[i] for i in f_idx],
            "to_label": [self.labels[j] for j in t_idx],
            "weight": self.trans_w[f_idx, t_idx],
        }).sort_values("weight", ascending=False, kind="stable").reset_index(drop=True)
        return states, trans

    # --- S4 model sink ---
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        states, trans = self.coefficients()
        states.to_parquet(os.path.join(path, "states.parquet"), index=False)
        trans.to_parquet(os.path.join(path, "transitions.parquet"), index=False)
        if self.emb_w is not None:
            d_idx, l_idx = np.nonzero(self.emb_w)
            pd.DataFrame({
                "dimension": [self.emb_names[i] for i in d_idx],
                "label": [self.labels[j] for j in l_idx],
                "weight": self.emb_w[d_idx, l_idx],
            }).to_parquet(os.path.join(path, "emb_states.parquet"), index=False)
        with open(os.path.join(path, "manifest.json"), "w") as f:
            json.dump({"labels": self.labels, "meta": self.meta,
                       "emb_names": self.emb_names}, f, indent=1)

    # --- S5 model scan ---
    @classmethod
    def load(cls, path: str) -> "CRFModel":
        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        labels = manifest["labels"]
        states = pd.read_parquet(os.path.join(path, "states.parquet"))
        trans = pd.read_parquet(os.path.join(path, "transitions.parquet"))
        attrs = sorted(states["attribute"].unique().tolist())
        a2i = {a: i for i, a in enumerate(attrs)}
        l2i = {l: i for i, l in enumerate(labels)}
        A, L = len(attrs), len(labels)
        state_w = np.zeros((A, L), dtype=np.float64)
        state_w[
            states["attribute"].map(a2i).to_numpy(),
            states["label"].map(l2i).to_numpy(),
        ] = states["weight"].to_numpy()
        trans_w = np.zeros((L, L), dtype=np.float64)
        if len(trans):
            trans_w[
                trans["from_label"].map(l2i).to_numpy(),
                trans["to_label"].map(l2i).to_numpy(),
            ] = trans["weight"].to_numpy()
        emb_names = manifest.get("emb_names", [])
        emb_w = None
        emb_path = os.path.join(path, "emb_states.parquet")
        if emb_names and os.path.exists(emb_path):
            emb = pd.read_parquet(emb_path)
            d2i = {d: i for i, d in enumerate(emb_names)}
            emb_w = np.zeros((len(emb_names), L), dtype=np.float64)
            emb_w[
                emb["dimension"].map(d2i).to_numpy(),
                emb["label"].map(l2i).to_numpy(),
            ] = emb["weight"].to_numpy()
        return cls(labels=labels, attrs=attrs, state_w=state_w, trans_w=trans_w,
                   meta=manifest.get("meta", {}),
                   emb_names=emb_names, emb_w=emb_w)

    # --- binary .crfsuite interop (lCRF/FOMC v100, crf1d_model.c) ---
    @classmethod
    def from_crfsuite(cls, path: str) -> "CRFModel":
        """Load a binary ``.crfsuite`` model file — the artifact the
        reference's ``crf()`` writes and ``as.crf`` loads
        (R/modelling.R:165-174) — so users migrate R-trained models
        directly into this engine. Parses the documented lCRF/FOMC
        layout (crf1d_model.c:43-75) including the CQDB string chunks;
        see train/crfsuite_io.py. Real-valued embedding attributes do
        not exist in the binary format (they are plain attributes
        there), so ``emb_w`` is always None."""
        from crfsuite_spark.train.crfsuite_io import read_model

        labels, attrs, state_w, trans_w = read_model(path)
        return cls(labels=labels, attrs=attrs, state_w=state_w,
                   trans_w=trans_w, meta={"source": "crfsuite-binary"})

    def to_crfsuite(self, path: str) -> None:
        """Write this model as a binary ``.crfsuite`` file the reference
        can open (Tagger::open / as.crf): FEAT records, CQDB label and
        attribute chunks with real lookup3 hash tables, LFRF/AFRF
        feature references. Zero-weight features and orphaned
        attributes are pruned with renumbering, exactly like
        crf1de_save_model (crf1d_encode.c:582-618). Embedding weights
        have no binary-format representation and are not written."""
        from crfsuite_spark.train.crfsuite_io import write_model

        write_model(path, self.labels, self.attrs, self.state_w, self.trans_w)

    def dump(self) -> str:
        """S6 human-readable text dump (crfsuite_model_dump analogue)."""
        states, trans = self.coefficients()
        out = [f"labels: {self.labels}", f"attrs: {len(self.attrs)}", "TRANSITIONS:"]
        out += [f"  {r.from_label} -> {r.to_label}: {r.weight:+.6f}" for r in trans.itertuples()]
        out.append("STATE FEATURES (top 50):")
        out += [f"  {r.attribute} -> {r.label}: {r.weight:+.6f}" for r in states.head(50).itertuples()]
        return "\n".join(out)

    def summary(self, iter_log: list | None = None) -> dict:
        """S8 ``summary.crf`` analogue (R/modelling.R:187-226): model
        dimensions + size (print.crf shows Mb, R/modelling.R:177-183)
        and, when the trainer's per-iteration ``log`` list is supplied,
        the parsed iteration metrics the R side regex-extracts from the
        trainer log file."""
        n_nonzero = int((self.state_w != 0).sum() + (self.trans_w != 0).sum())
        out = {
            "n_labels": len(self.labels),
            "n_attributes": len(self.attrs),
            "n_nonzero_weights": n_nonzero,
            "size_mb": round(
                (self.state_w.nbytes + self.trans_w.nbytes
                 + sum(len(a) for a in self.attrs)) / 1e6, 3),
            "labels": list(self.labels),
            **{k: v for k, v in self.meta.items()},
        }
        if iter_log:
            out["iterations"] = [dict(r) for r in iter_log]
            out["last_iteration"] = dict(iter_log[-1])
        return out
