"""Fused zero-shuffle decode: tokenize + window templates + Viterbi in
ONE Arrow pass over the unexploded transcript table.

The canonical decode path (functions/tokenize.py → functions/
templates.py → decode/tagger.py) explodes turns into token rows and
pays one hash Exchange of the whole token stream so the window
lag/leads and the Arrow UDF see sequence-contiguous rows. But a
*sequence is one transcript row* (key = conv_id, turn_idx — the
input-table shape from BASELINE.json:input_hint): everything the
templates need is already co-located inside the row's own text. This
module exploits that: ``mapInPandas`` directly over the transcript
table tokenizes, builds the window templates, resolves attributes
against the broadcast model and runs the batched Viterbi (kernel K9)
inside a single Arrow hop — ZERO Exchange (plan-asserted,
tests/test_plans.py). At 10^12-turn scale this removes the only
shuffle of the token stream — the dominant cost of the tagging stage
(~31 M exploded token rows at sf10, measured 81 % of kg_pipeline) —
and parallelism is the parquet-split parallelism of the input. Hot
conversations spread across splits row-by-row, so the largest skew
unit is one turn, strictly smaller than the canonical path's
per-sequence shuffle key.

No per-token Python, and no per-token feature strings either. Per
Arrow batch the tokens are factorized (``pd.factorize``) and every
template is resolved per *distinct* value (unigram templates) or per
*distinct* window combination (n-gram templates); the resolved model
weight-rows are then gathered back to token positions with pure numpy
indexing. The per-distinct work is bounded by batch vocabulary — not
token count (Zipf) — and a process-lifetime memo carries resolved
attribute rows across batches, so steady-state batches only format
strings for never-seen-before combinations.

Label output is bit-identical to the canonical path
(tests/test_fused_decode.py asserts exact frame equality, marginals
included). Reference parity: same template semantics as
crf_cbind_attributes (R/feature_engineering.R:48-111) and the same
tagging contract as predict.crf (src/rcpp_crfsuite.cpp:176-255);
unknown attributes drop exactly like crfsuite.hpp:403-410.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from crfsuite_spark.datagen.transcripts import FUNC_WORDS, VERB_WORDS
from crfsuite_spark.decode.tagger import viterbi_outputs
from crfsuite_spark.functions.tokenize import _PREPS
from crfsuite_spark.train.model import CRFModel

# closed POS tag set, selection order = functions/tokenize.pos_column
_POS_TAGS = np.array(["Punc", "V", "Prep", "Art", "NNP", "Num", "N"], dtype=object)
_PUNCT = [".", ",", "?", ":", "!", ";"]

FUSED_TERMS = ("token", "pos")


def _pos_ids_of_uniq(uniq: np.ndarray) -> np.ndarray:
    """POS tag index per distinct token — vectorized twin of
    functions/tokenize.pos_column (same predicates, same order)."""
    u = pd.Series(uniq, dtype=object)
    low = u.str.lower()
    conds = [
        u.isin(_PUNCT).to_numpy(),
        low.isin(sorted(VERB_WORDS)).to_numpy(),
        low.isin(sorted(_PREPS)).to_numpy(),
        low.isin(sorted(FUNC_WORDS - _PREPS)).to_numpy(),
        u.str.match(r"[A-Z]", na=False).to_numpy(),
        u.str.fullmatch(r"[0-9]+", na=False).to_numpy(),
    ]
    return np.select(conds, np.arange(6), default=6).astype(np.int64)


def _shift_ids(ids: np.ndarray, seq_of: np.ndarray, k: int) -> np.ndarray:
    """ids shifted by window offset k within sequences; -1 outside."""
    n = len(ids)
    if k == 0:
        return ids
    out = np.full(n, -1, dtype=np.int64)
    kk = abs(k)
    if kk >= n:
        return out
    same = seq_of[kk:] == seq_of[:-kk]
    if k > 0:  # lead: value comes from position i + k
        np.copyto(out[:-kk], ids[kk:], where=same)
    else:  # lag
        np.copyto(out[kk:], ids[:-kk], where=same)
    return out


# memo entries are ~100 B each; 4M ≈ 400 MB/worker upper bound. An
# open-vocabulary corpus (random ids, hashes) would otherwise grow the
# memo without bound over a long-lived executor — on reset the next
# batch simply re-resolves its distinct strings against the broadcast.
_MEMO_CAP = 4_000_000

# n-gram combos pack into one int64 as mixed-radix digits while
# vocab^k fits; beyond that the exact row-wise unique path takes over
_RADIX_LIMIT = 2**62


def _rows_for(strings, attr2row: dict, memo: dict) -> np.ndarray:
    """Model weight-row per attribute string (-1 = unknown, dropped —
    crfsuite.hpp:403-410). Loop is per DISTINCT string only; `memo`
    lives for the worker process, so repeated vocabulary across Arrow
    batches costs one dict hit."""
    if len(memo) > _MEMO_CAP:
        memo.clear()
    out = np.empty(len(strings), dtype=np.int64)
    mget, aget = memo.get, attr2row.get
    for i, s in enumerate(strings):
        r = mget(s)
        if r is None:
            r = aget(s, -1)
            memo[s] = r
        out[i] = r
    return out


def _build_templates(terms, from_offset, to_offset, ngram_max, sep):
    """(singles, ngrams) descriptors with the exact attribute names
    cbind_attributes generates (templates.py:50-73)."""
    singles = []  # (term, offset, column name)
    ngrams = []  # (term, joined name, offsets tuple)
    for term in terms:
        level1 = []
        for off in range(from_offset, to_offset + 1):
            name = f"{term}[t{'' if off == 0 else ('%+d' % off)}]"
            level1.append((name, off))
            singles.append((term, off, name))
        for size in range(2, min(ngram_max, len(level1)) + 1):
            for combo in combinations(level1, size):
                ngrams.append(
                    (
                        term,
                        sep.join(n for n, _ in combo),
                        tuple(o for _, o in combo),
                    )
                )
    return singles, ngrams


def _spans_from_labels(
    lab_id, seq_of, token_idx, tok,
    et_id_of, et_str_of, is_o, is_b, is_i, continues, n_et,
):
    """BIO runs over ordered whole-sequence token arrays → span arrays
    (seq, span_id, etype, start_tok, end_tok, surface). Semantics are
    kg/spans.py:assemble_spans for B-/I-/O label sets: change-point
    starts, per-sequence running-sum numbering. Label-level predicates
    arrive precomputed (L-sized), so the hot path is pure gathers."""
    valid = ~is_o[lab_id]
    if not valid.any():
        z = np.empty(0, dtype=np.int64)
        return z, z, np.empty(0, dtype=object), z, z, np.empty(0, dtype=object)
    n = len(lab_id)
    first_in_seq = np.ones(n, dtype=bool)
    first_in_seq[1:] = seq_of[1:] != seq_of[:-1]
    cont = np.zeros(n, dtype=bool)
    m = ~first_in_seq
    if m.any():
        cont[1:][m[1:]] = continues[lab_id[:-1][m[1:]], lab_id[1:][m[1:]]]
    is_start = valid & (is_b[lab_id] | (is_i[lab_id] & ~cont))
    gcum = np.cumsum(is_start.astype(np.int64))
    seq_first = np.flatnonzero(first_in_seq)
    base = gcum[seq_first] - is_start[seq_first]
    vidx = np.flatnonzero(valid)
    key = gcum[vidx] * np.int64(n_et) + et_id_of[lab_id[vidx]]
    brk = np.ones(len(vidx), dtype=bool)
    brk[1:] = (key[1:] != key[:-1]) | (vidx[1:] != vidx[:-1] + 1)
    s_pos = np.flatnonzero(brk)
    first = vidx[s_pos]
    last = vidx[np.append(s_pos[1:] - 1, len(vidx) - 1)]
    span_seq = seq_of[first]
    span_id = gcum[first] - base[span_seq]
    etype = et_str_of[lab_id[first]]
    start_tok = token_idx[first]
    end_tok = token_idx[last]
    # per-SPAN loop (mention count ≪ token count); run rows are adjacent
    surface = np.array(
        [" ".join(tok[a : b + 1]) for a, b in zip(first, last)], dtype=object
    )
    return span_seq, span_id, etype, start_tok, end_tok, surface


def _relations_from_spans(span_seq, etype, start_tok, end_tok, surface):
    """Turn-local nearest-entity grammar (kg/spans.py:
    assemble_relations): subject = entity span with the greatest
    end_tok before the REL span, object = smallest start_tok after it.
    Span arrays arrive sorted by (seq, start) and spans are disjoint,
    so per-seq end_toks are sorted too — both lookups are one
    searchsorted over (seq << 32 | tok) composite keys."""
    is_rel = etype == "REL"
    if not is_rel.any() or is_rel.all():
        z = np.empty(0, dtype=np.int64)
        o = np.empty(0, dtype=object)
        return z, o, o, o, o, o
    ent = ~is_rel
    shift = np.int64(1) << 32
    e_seq = span_seq[ent]
    ekey_end = e_seq * shift + end_tok[ent]
    ekey_start = e_seq * shift + start_tok[ent]
    r_seq = span_seq[is_rel]
    si = np.searchsorted(ekey_end, r_seq * shift + start_tok[is_rel], side="left") - 1
    subj_ok = si >= 0
    subj_ok &= e_seq[np.maximum(si, 0)] == r_seq
    oi = np.searchsorted(ekey_start, r_seq * shift + end_tok[is_rel], side="right")
    obj_ok = oi < len(e_seq)
    obj_ok &= e_seq[np.minimum(oi, len(e_seq) - 1)] == r_seq
    keep = subj_ok & obj_ok
    e_surface = surface[ent]
    e_type = etype[ent]
    return (
        r_seq[keep],
        e_surface[si[keep]],
        e_type[si[keep]],
        e_surface[oi[keep]],
        e_type[oi[keep]],
        surface[is_rel][keep],
    )


def decode_fused(
    transcripts: DataFrame,
    model: CRFModel,
    seq_cols: list[str] = ("conv_id", "turn_idx"),
    text_col: str = "text",
    terms: list[str] = ("token", "pos"),
    from_offset: int = -2,
    to_offset: int = 2,
    ngram_max: int = 2,
    sep: str = "-",
    bos_eos: bool = True,
    with_marginal: bool = False,
    emit: str = "tokens",
    pronouns: "set[str] | None" = None,
    span_filter_col: "str | None" = None,
) -> DataFrame:
    """Viterbi-tag every turn straight off the transcript table.

    ``emit="tokens"`` (default): one row per token — ``*seq_cols,
    token_idx, token, label [, marginal, seq_prob]`` — identical
    (values AND schema) to the canonical ``tokenize →
    cbind_attributes → decode`` chain with
    ``passthrough_cols=[*seq_cols, "token_idx", "token"]``.

    ``emit="spans"``: BIO span assembly also happens inside the same
    Arrow pass (the sequences are already whole and ordered in numpy);
    one row per mention span, identical to
    ``kg.spans.assemble_spans(decode output)`` for B-/I-/O label sets
    — and the 31M-token intermediate never exists as Spark rows.

    ``emit="relations"``: the turn-local nearest-entity grammar runs
    in the pass too; one row per (subject, REL, object) candidate,
    identical to ``assemble_relations(assemble_spans(...))`` minus the
    predicate-map column (applied JVM-side by the pipeline so the map
    stays a Catalyst literal). All modes are zero-Exchange.

    ``emit="coref"``: ONE pass emits a kind-tagged union of the
    relation rows (kind='rel'), the mention span rows (kind='span'),
    and the turn's pronoun tokens (kind='pron', matched against
    ``pronouns`` lowercase) — everything the pipeline's coref stage
    needs, so pronoun resolution costs one scan plus work proportional
    to the PRONOUN-BEARING turns instead of a second decode pass and
    corpus-wide staged relation assembly (kg/pipeline.py). With
    ``span_filter_col`` (a boolean input column, e.g. "conversation
    contains a pronoun" pre-computed by a cheap JVM scan), span and
    pronoun rows are emitted ONLY for rows where it is true — relation
    rows are always emitted — so the union's overhead scales with
    pronoun density, not corpus size.

    Only derivable terms are supported (``token``, ``pos``): both are
    pure functions of the row's text, which is what makes the fusion
    legal. Callers with exotic terms or pre-built token tables use the
    canonical :func:`crfsuite_spark.decode.tagger.decode`.
    """
    unsupported = set(terms) - set(FUSED_TERMS)
    if unsupported:
        raise ValueError(
            f"decode_fused only derives terms {FUSED_TERMS}; got {sorted(unsupported)}"
        )
    if emit not in ("tokens", "spans", "relations", "coref"):
        raise ValueError(f"unknown emit mode {emit!r}")
    if emit == "coref" and not pronouns:
        raise ValueError("emit='coref' requires a non-empty pronouns set")
    if span_filter_col is not None and emit != "coref":
        raise ValueError("span_filter_col only applies to emit='coref'")
    if span_filter_col is not None and span_filter_col not in transcripts.columns:
        raise ValueError(f"span_filter_col {span_filter_col!r} not in input")
    pron_list = sorted({p.lower() for p in pronouns}) if pronouns else []
    if emit != "tokens" and with_marginal:
        raise ValueError("with_marginal only applies to emit='tokens'")
    terms = list(terms)
    seq_cols = list(seq_cols)
    spark = transcripts.sparkSession
    sc = spark.sparkContext

    singles, ngrams = _build_templates(terms, from_offset, to_offset, ngram_max, sep)
    attr2row = model.attr2id
    # model-driven template pruning: a template whose name matches NO
    # stored attribute can only ever resolve to misses (the reference
    # scores only model-present attributes, crfsuite.hpp:403-410), so
    # skip its shifts/gathers entirely. Models pruned by feature
    # minfreq routinely drop whole templates; output is identical by
    # construction (parity tests cover both full and unigram models).
    present = {a.split("=", 1)[0] for a in model.attrs}
    singles = [s for s in singles if s[2] in present]
    ngrams = [g for g in ngrams if g[1] in present]
    # shifts needed by surviving templates (an n-gram may need an
    # offset whose own single template was pruned)
    needed_shifts = sorted(
        {(t, o) for t, o, _ in singles}
        | {(t, o) for t, _, offs in ngrams for o in offs}
    )
    used_terms = {t for t, _ in needed_shifts}
    # captured by value so the closure ships it to workers (and tests
    # can monkeypatch the module constant driver-side)
    radix_limit = _RADIX_LIMIT
    # positional features resolve driver-side once: tiny, fixed names
    bos_rows = [attr2row.get(f"BOS+{k}", -1) for k in (0, 1)] if bos_eos else []
    eos_rows = [attr2row.get(f"EOS-{k}", -1) for k in (0, 1)] if bos_eos else []
    bc = sc.broadcast(
        (
            attr2row,
            model.state_w,
            model.trans_w,
            np.array(model.labels, dtype=object),
        )
    )

    # label-level predicates for span/relation assembly (L-sized)
    labels_list = list(model.labels)
    et_str_of = np.array([l.rpartition("-")[2] for l in labels_list], dtype=object)
    et_id_of = pd.factorize(et_str_of)[0].astype(np.int64)
    n_et = int(et_id_of.max()) + 1 if len(et_id_of) else 1
    is_o = np.array([l == "O" for l in labels_list])
    is_b = np.array([l.startswith("B-") for l in labels_list])
    is_i = np.array([l.startswith("I-") for l in labels_list])
    # continues[p, c]: current token continues a run after prev label p
    # (prev is B-x or I-x of the SAME type — spans.py:43-45)
    continues = (is_b | is_i)[:, None] & (et_str_of[:, None] == et_str_of[None, :])

    types = {f.name: f.dataType.simpleString() for f in transcripts.schema.fields}
    out_schema = ", ".join(f"`{c}` {types[c]}" for c in seq_cols)
    if emit == "tokens":
        out_schema += ", token_idx int, token string, label string"
        if with_marginal:
            out_schema += ", marginal double, seq_prob double"
        out_cols = [*seq_cols, "token_idx", "token", "label"] + (
            ["marginal", "seq_prob"] if with_marginal else []
        )
    elif emit == "spans":
        out_schema += (
            ", span_id bigint, entity_type string, surface string"
            ", start_tok int, end_tok int"
        )
        out_cols = [*seq_cols, "span_id", "entity_type", "surface",
                    "start_tok", "end_tok"]
    elif emit == "relations":
        out_schema += (
            ", subj_surface string, subj_type string, obj_surface string"
            ", obj_type string, rel_surface string"
        )
        out_cols = [*seq_cols, "subj_surface", "subj_type",
                    "obj_surface", "obj_type", "rel_surface"]
    else:  # coref: kind-tagged union of rel + span + pron rows
        out_schema += (
            ", kind string"
            ", span_id bigint, entity_type string, surface string"
            ", start_tok int, end_tok int"
            ", subj_surface string, subj_type string, obj_surface string"
            ", obj_type string, rel_surface string"
            ", pron_pos int, pronoun string"
        )
        out_cols = [*seq_cols, "kind",
                    "span_id", "entity_type", "surface",
                    "start_tok", "end_tok",
                    "subj_surface", "subj_type", "obj_surface",
                    "obj_type", "rel_surface", "pron_pos", "pronoun"]

    def run(batches):
        attr2row, state_w, trans_w, labels = bc.value
        memo: dict = {}  # attr string -> weight row, process-lifetime

        def empty():
            return pd.DataFrame({c: pd.Series(dtype=object) for c in out_cols})

        for pdf in batches:
            n_rows = len(pdf)
            if n_rows == 0:
                yield empty()
                continue
            # --- tokenize (posexplode(split) twin, tokenize.py:46-50):
            # token_idx = position in the raw split, empties dropped
            splits = pdf[text_col].fillna("").str.split(" ")
            lens_raw = splits.str.len().to_numpy(dtype=np.int64)
            total = int(lens_raw.sum())
            if total == 0:
                yield empty()
                continue
            flat = np.concatenate(splits.to_numpy())
            row_of = np.repeat(np.arange(n_rows), lens_raw)
            starts_raw = np.zeros(n_rows, dtype=np.int64)
            np.cumsum(lens_raw[:-1], out=starts_raw[1:])
            orig_pos = np.arange(total, dtype=np.int64) - starts_raw[row_of]
            keep = flat != ""
            tok = flat[keep]
            token_idx = orig_pos[keep]
            seq_row = row_of[keep]
            n_tok = len(tok)
            if n_tok == 0:
                yield empty()
                continue
            # dense sequence index per token (rows with zero tokens
            # vanish, exactly like the explode-side filter)
            per_row = np.bincount(seq_row, minlength=n_rows)
            nz = per_row > 0
            lengths = per_row[nz]
            row2seq = np.full(n_rows, -1, dtype=np.int64)
            row2seq[nz] = np.arange(int(nz.sum()))
            seq_of = row2seq[seq_row]

            # --- factorize once; POS derives per distinct token
            codes, uniq = pd.factorize(tok)
            codes = codes.astype(np.int64, copy=False)
            uniq = np.asarray(uniq, dtype=object)
            term_ids = {}
            term_uniq = {}
            if "token" in used_terms:
                term_ids["token"] = codes
                term_uniq["token"] = uniq
            if "pos" in used_terms:
                term_ids["pos"] = _pos_ids_of_uniq(uniq)[codes]
                term_uniq["pos"] = _POS_TAGS

            shifted = {
                (term, off): _shift_ids(term_ids[term], seq_of, off)
                for term, off in needed_shifts
            }

            A, L = state_w.shape
            S = np.zeros((n_tok, L), dtype=np.float64)
            # --- unigram templates: one lookup per distinct value
            for term, off, name in singles:
                vals = term_uniq[term]
                rows = _rows_for(
                    [name + "=" + v for v in vals], attr2row, memo
                )
                vid = shifted[(term, off)]
                valid = vid >= 0
                r = rows[vid[valid]]
                hit = r >= 0
                if hit.any():
                    # indices are unique within one template: plain
                    # fancy-index add, no np.add.at needed
                    S[np.flatnonzero(valid)[hit]] += state_w[r[hit]]
            # --- n-gram templates: one lookup per distinct combination
            for term, name, offs in ngrams:
                vu = term_uniq[term]
                vt = len(vu)
                vids = [shifted[(term, o)] for o in offs]
                valid = vids[0] >= 0
                for v in vids[1:]:
                    valid &= v >= 0
                if not valid.any():
                    continue
                if vt ** len(offs) < radix_limit:
                    # radix coding: one 1-D unique over composed int64s
                    code = vids[0][valid]
                    for v in vids[1:]:
                        code = code * vt + v[valid]
                    up, inv = np.unique(code, return_inverse=True)
                    digits = []
                    c = up
                    for _ in offs:
                        digits.append(c % vt)
                        c = c // vt
                    digits.reverse()
                else:
                    # huge batch vocabulary (vt^k would overflow int64):
                    # exact row-wise unique instead — slower (lexsort)
                    # but can't fail mid-job at scale
                    stacked = np.stack([v[valid] for v in vids], axis=1)
                    uprows, inv = np.unique(stacked, axis=0, return_inverse=True)
                    inv = inv.ravel()
                    digits = [uprows[:, j] for j in range(len(offs))]
                    up = np.arange(len(uprows))
                names = [
                    name + "=" + sep.join(vu[d[i]] for d in digits)
                    for i in range(len(up))
                ]
                rows = _rows_for(names, attr2row, memo)
                r = rows[inv]
                hit = r >= 0
                if hit.any():
                    S[np.flatnonzero(valid)[hit]] += state_w[r[hit]]
            # --- BOS/EOS positional features (W5)
            if bos_eos:
                starts_seq = np.zeros(len(lengths), dtype=np.int64)
                np.cumsum(lengths[:-1], out=starts_seq[1:])
                rn0 = np.arange(n_tok, dtype=np.int64) - starts_seq[seq_of]
                rem = lengths[seq_of] - 1 - rn0
                for k, row in enumerate(bos_rows):
                    if row >= 0:
                        S[rn0 == k] += state_w[row]
                for k, row in enumerate(eos_rows):
                    if row >= 0:
                        S[rem == k] += state_w[row]

            cols = viterbi_outputs(
                S, lengths, trans_w, labels, with_marginal,
                with_ids=(emit != "tokens"),
            )
            if emit == "tokens":
                out = pd.DataFrame(index=pd.RangeIndex(n_tok))
                for c in seq_cols:
                    out[c] = pdf[c].to_numpy()[seq_row]
                out["token_idx"] = token_idx
                out["token"] = tok
                for name_, vals_ in cols.items():
                    out[name_] = vals_
                yield out
                continue
            span_seq, span_id, etype_a, st, en, surf = _spans_from_labels(
                cols["label_id"], seq_of, token_idx, tok,
                et_id_of, et_str_of, is_o, is_b, is_i, continues, n_et,
            )
            seq2row = np.flatnonzero(nz)
            if emit == "spans":
                rows = seq2row[span_seq]
                out = pd.DataFrame(index=pd.RangeIndex(len(span_seq)))
                for c in seq_cols:
                    out[c] = pdf[c].to_numpy()[rows]
                out["span_id"] = span_id
                out["entity_type"] = etype_a
                out["surface"] = surf
                out["start_tok"] = st
                out["end_tok"] = en
                yield out
                continue
            r_seq, ssur, styp, osur, otyp, rsur = _relations_from_spans(
                span_seq, etype_a, st, en, surf
            )
            if emit == "coref":
                def _int_arr(vals, n_out, np_dtype):
                    # vectorized nullable ints: a per-element
                    # [pd.NA]*n list was the hot spot at 2.7M rows
                    if vals is None:
                        return pd.arrays.IntegerArray(
                            np.zeros(n_out, dtype=np_dtype),
                            np.ones(n_out, dtype=bool),
                        )
                    return pd.arrays.IntegerArray(
                        np.asarray(vals, dtype=np_dtype),
                        np.zeros(n_out, dtype=bool),
                    )

                def uni(n_out, rowsel, kind, **cols):
                    f = pd.DataFrame(index=pd.RangeIndex(n_out))
                    for c in seq_cols:
                        f[c] = pdf[c].to_numpy()[rowsel]
                    f["kind"] = kind
                    for name_, np_dtype in (("span_id", np.int64),
                                            ("start_tok", np.int32),
                                            ("end_tok", np.int32),
                                            ("pron_pos", np.int32)):
                        f[name_] = _int_arr(cols.get(name_), n_out, np_dtype)
                    for name_ in ("entity_type", "surface", "subj_surface",
                                  "subj_type", "obj_surface", "obj_type",
                                  "rel_surface", "pronoun"):
                        f[name_] = cols.get(name_)
                    return f[out_cols]
                low = pd.Series(tok).str.lower().to_numpy()
                pmask = np.isin(low, pron_list)
                if span_filter_col is not None:
                    row_flag = (
                        pdf[span_filter_col].fillna(False)
                        .to_numpy().astype(bool)
                    )
                    pmask &= row_flag[seq_row]
                    span_keep = row_flag[seq2row[span_seq]]
                else:
                    span_keep = np.ones(len(span_seq), dtype=bool)
                parts = []
                if len(r_seq):
                    parts.append(uni(
                        len(r_seq), seq2row[r_seq], "rel",
                        subj_surface=ssur, subj_type=styp,
                        obj_surface=osur, obj_type=otyp, rel_surface=rsur,
                    ))
                if span_keep.any():
                    parts.append(uni(
                        int(span_keep.sum()),
                        seq2row[span_seq[span_keep]], "span",
                        span_id=span_id[span_keep],
                        entity_type=etype_a[span_keep],
                        surface=surf[span_keep],
                        start_tok=st[span_keep], end_tok=en[span_keep],
                    ))
                if pmask.any():
                    parts.append(uni(
                        int(pmask.sum()), seq_row[pmask], "pron",
                        pron_pos=token_idx[pmask], pronoun=low[pmask],
                    ))
                yield pd.concat(parts, ignore_index=True) if parts else empty()
                continue
            rows = seq2row[r_seq]
            out = pd.DataFrame(index=pd.RangeIndex(len(r_seq)))
            for c in seq_cols:
                out[c] = pdf[c].to_numpy()[rows]
            out["subj_surface"] = ssur
            out["subj_type"] = styp
            out["obj_surface"] = osur
            out["obj_type"] = otyp
            out["rel_surface"] = rsur
            yield out

    keep_cols = [*seq_cols, text_col] + (
        [span_filter_col] if span_filter_col is not None else []
    )
    pruned = transcripts.select(*keep_cols)
    return pruned.mapInPandas(run, out_schema)


def decode_spans_fused(transcripts: DataFrame, model: CRFModel, **kw) -> DataFrame:
    """Transcripts → mention spans in one zero-shuffle Arrow pass
    (assemble_spans semantics; see :func:`decode_fused` emit='spans')."""
    return decode_fused(transcripts, model, emit="spans", **kw)


def decode_relations_fused(transcripts: DataFrame, model: CRFModel, **kw) -> DataFrame:
    """Transcripts → (subject, REL, object) candidate rows in one
    zero-shuffle Arrow pass (assemble_relations semantics minus the
    predicate column; see :func:`decode_fused` emit='relations')."""
    return decode_fused(transcripts, model, emit="relations", **kw)
