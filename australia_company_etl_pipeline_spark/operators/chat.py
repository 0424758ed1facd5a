"""Chat/SFT sample assembly — the last mile between a curated corpus
and a fine-tuning run.

A pretraining pipeline ends at packed token shards; an SFT pipeline
ends at RENDERED conversations: multi-turn (role, content) records
flattened through a chat template, validated for structural sanity
(roles alternate, the sample ends on an assistant turn, nothing is
empty), loss-masked so only assistant spans train, and deduplicated by
prompt so one over-represented instruction can't dominate an epoch.
Public recipes (Alpaca/Vicuna-style SFT sets, HuggingFace
`apply_chat_template`) all perform exactly these four steps; this
module expresses them as pure Column expressions so they run inside
whole-stage codegen at corpus scale — no UDF, no driver loop.

Everything is deterministic string/length arithmetic, which is the
point: the driver oracle replays rendering and span offsets in DuckDB
character-for-character (`corpus_filter_stats` kind='chat'), the same
discipline as the HTML-extraction and C4 folds.

Template contract (``DEFAULT_TEMPLATE``): each role renders as
``prefix + content + suffix``. Offsets returned by
``assistant_spans`` are 0-based CHARACTER offsets into the rendered
string, [start, end) around the assistant CONTENT only (markers never
train). Character offsets are the portable interchange form — the
tokenizer-side loss mask derives from them after encoding, which is
how offset-mapping-based maskers (fast-tokenizer ``return_offsets``)
consume SFT data.

Scale notes: rendering/validation/spans are shuffle-free projections
over the conversation column; ``sft_pair_dedup`` is one
``cap_per_key`` (two-level salted top-n — skew-safe when one viral
prompt floods the feed, exact keep-best).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "DEFAULT_TEMPLATE", "TURNS_SCHEMA", "render_chat", "validate_chat",
    "assistant_spans", "sft_pair_dedup", "sft_prepare",
    "offset_spans", "preference_pairs",
]

# role -> (prefix, suffix); rendering is prefix + content + suffix
DEFAULT_TEMPLATE: dict[str, tuple[str, str]] = {
    "system": ("<|system|>\n", "\n"),
    "user": ("<|user|>\n", "\n"),
    "assistant": ("<|assistant|>\n", "<|end|>\n"),
}

TURNS_SCHEMA = "array<struct<role:string,content:string>>"


def _role_expr(role: Column, mapping: dict[str, str],
               default: str = "") -> Column:
    """Chained CASE over the template's roles — unknown roles hit the
    default ('' for markers: validate_chat flags them loudly, the
    renderer must not invent text for them)."""
    out: Column = F.lit(default)
    for r, v in mapping.items():
        out = F.when(role == r, F.lit(v)).otherwise(out)
    return out


def render_chat(turns: Column,
                template: dict[str, tuple[str, str]] | None = None,
                ) -> Column:
    """Flatten ``array<struct<role, content>>`` through the chat
    template: ``concat(prefix + content + suffix per turn)``. Pure
    codegen (transform + array_join) — no UDF. NULL content renders as
    '' (and is flagged by ``validate_chat``)."""
    tpl = template or DEFAULT_TEMPLATE
    pre = {r: ps[0] for r, ps in tpl.items()}
    suf = {r: ps[1] for r, ps in tpl.items()}
    return F.array_join(
        F.transform(turns, lambda t: F.concat(
            _role_expr(t["role"], pre),
            F.coalesce(t["content"], F.lit("")),
            _role_expr(t["role"], suf))),
        "")


def validate_chat(turns: Column,
                  template: dict[str, tuple[str, str]] | None = None,
                  start_roles: tuple[str, ...] = ("system", "user"),
                  system_role: str = "system",
                  train_role: str = "assistant") -> Column:
    """FIRST failing structural rule, NULL when valid (the
    ``corpus_filter`` drop-reason convention — a filter deleting 30%
    of an SFT set must be debuggable):

    - ``empty``: no turns (or NULL column);
    - ``unknown_role``: a NULL role, or one outside the template
      (NULL is flagged here, not silently skipped — a three-valued
      ``isin`` would otherwise let NULL-role rows pass EVERY check);
    - ``bad_start``: first role not in ``start_roles``;
    - ``misplaced_system``: ``system_role`` anywhere but turn 0;
    - ``repeated_role``: two consecutive turns with one role (no
      alternation — double-user means a lost response);
    - ``empty_content``: any NULL/whitespace-only content;
    - ``no_final_assistant``: the sample does not end on a
      ``train_role`` turn (nothing to train on).

    Templates with renamed roles must pass matching ``start_roles`` /
    ``system_role`` / ``train_role`` — the structural rules are about
    role FUNCTION, which the template's key names alone can't convey.
    """
    tpl = template or DEFAULT_TEMPLATE
    roles = F.transform(turns, lambda t: t["role"])
    known = list(tpl)
    n = F.size(turns)
    tail = F.slice(roles, 2, F.greatest(n - 1, F.lit(0)))
    # zip (r_i, r_{i+1}) to spot consecutive repeats
    repeats = F.exists(
        F.zip_with(F.slice(roles, 1, F.greatest(n - 1, F.lit(0))), tail,
                   lambda a, b: a == b), lambda x: x)
    return (
        F.when(turns.isNull() | (n == 0), F.lit("empty"))
        .when(F.exists(roles, lambda r: r.isNull() | ~r.isin(*known)),
              F.lit("unknown_role"))
        .when(~F.element_at(roles, 1).isin(*start_roles),
              F.lit("bad_start"))
        .when(F.exists(tail, lambda r: r == system_role),
              F.lit("misplaced_system"))
        .when(repeats, F.lit("repeated_role"))
        .when(F.exists(turns, lambda t: t["content"].isNull()
                       | (F.trim(t["content"]) == "")),
              F.lit("empty_content"))
        .when(F.element_at(roles, -1) != train_role,
              F.lit("no_final_assistant"))
        .otherwise(F.lit(None).cast("string")))


def assistant_spans(turns: Column,
                    template: dict[str, tuple[str, str]] | None = None,
                    train_role: str = "assistant") -> Column:
    """0-based character [start, end) offsets of each ASSISTANT turn's
    CONTENT inside ``render_chat(turns)`` — the loss mask (markers and
    non-assistant turns never train). One ``aggregate`` fold carrying
    (cursor, spans): per turn the cursor advances by
    ``len(prefix) + len(content) + len(suffix)``; assistant turns also
    append ``(cursor + len(prefix), cursor + len(prefix) +
    len(content))``. Pure codegen arithmetic — DuckDB replays it
    exactly."""
    tpl = template or DEFAULT_TEMPLATE
    pre = {r: ps[0] for r, ps in tpl.items()}
    suf = {r: ps[1] for r, ps in tpl.items()}

    def step(acc, t):
        plen = F.length(_role_expr(t["role"], pre))
        clen = F.length(F.coalesce(t["content"], F.lit("")))
        slen = F.length(_role_expr(t["role"], suf))
        start = acc["pos"] + plen
        span = F.struct(start.alias("start"),
                        (start + clen).alias("end"))
        return F.struct(
            (acc["pos"] + plen + clen + slen).alias("pos"),
            F.when(t["role"] == train_role,
                   F.array_append(acc["spans"], span))
            .otherwise(acc["spans"]).alias("spans"))

    zero = F.struct(
        F.lit(0).cast("int").alias("pos"),
        F.array().cast("array<struct<start:int,end:int>>")
        .alias("spans"))
    return F.aggregate(turns, zero, step, lambda acc: acc["spans"])


def sft_pair_dedup(df: DataFrame, prompt_col: str, id_col: str,
                   order_col: str | None = None, n: int = 1,
                   salt_buckets: int = 64) -> DataFrame:
    """Keep ``n`` (default 1) samples per distinct prompt — the SFT
    twin of ``urls.url_dedup``: instruction sets are scraped/merged
    from overlapping sources, and a duplicated prompt over-weights its
    answer every epoch. Keep-best via ``order_col`` ascending (e.g. a
    negated reward/quality score), else the seeded content hash.
    Without ``order_col`` the default keep is FIRST ARRIVAL (min
    ``id_col`` — consistent with ``url_dedup`` and the streaming
    ingest's min-id index tournament). Shape: ``cap_per_key`` on
    ``md5(prompt)`` — two-level salted top-n, skew-safe when one viral
    prompt floods the feed; NULL/'' prompts are quarantined (kept,
    never collapsed), mirroring url_dedup's '' rule."""
    from .textstats import cap_per_key

    tagged = df.withColumn(
        "__pk", F.md5(F.coalesce(F.col(prompt_col), F.lit(""))))
    good = tagged.filter(F.coalesce(F.col(prompt_col), F.lit("")) != "")
    bad = tagged.filter(F.coalesce(F.col(prompt_col), F.lit("")) == "")
    kept = cap_per_key(good, ["__pk"], n,
                       order_col=order_col or id_col,
                       salt_buckets=salt_buckets)
    return kept.unionByName(bad).drop("__pk")


def sft_prepare(df: DataFrame, turns_col: str, id_col: str,
                order_col: str | None = None,
                template: dict[str, tuple[str, str]] | None = None,
                ) -> tuple[DataFrame, DataFrame]:
    """One-call SFT prep: validate → drop invalid (attributed) →
    prompt-dedup → render + loss-mask spans.

    Prompt identity for the dedup = the rendered conversation MINUS
    its final assistant turn (the standard notion: two samples with
    one prompt and different answers are duplicates; keep the best by
    ``order_col`` ascending, e.g. a negated reward).

    Returns ``(samples, report)``:

    - ``samples``: ``(id_col, text, spans, n_turns)`` — the rendered
      training string and its assistant character spans, one row per
      surviving conversation;
    - ``report``: ``(reason, n)`` — counts per validation drop reason
      plus ``'kept'`` (the observability layer: an SFT filter deleting
      30% of a set must say why).

    Shape: validation/rendering are shuffle-free projections; the
    report is one partial agg; the dedup is one salted cap. Nothing
    touches the driver."""
    turns = F.col(turns_col)
    flagged = df.withColumn("__reason",
                            validate_chat(turns, template))
    report = (flagged
              .groupBy(F.coalesce("__reason", F.lit("kept"))
                       .alias("reason"))
              .agg(F.count(F.lit(1)).alias("n")))
    valid = flagged.filter(F.col("__reason").isNull()).drop("__reason")
    prompt = render_chat(
        F.slice(turns, 1, F.greatest(F.size(turns) - 1, F.lit(0))),
        template)
    deduped = sft_pair_dedup(valid.withColumn("__prompt", prompt),
                             "__prompt", id_col, order_col=order_col)
    samples = deduped.select(
        F.col(id_col),
        render_chat(turns, template).alias("text"),
        assistant_spans(turns, template).alias("spans"),
        F.size(turns).alias("n_turns"))
    return samples, report


def preference_pairs(df: DataFrame, prompt_col: str, response_col: str,
                     score_col: str, id_col: str,
                     min_margin: float = 0.0) -> DataFrame:
    """Preference-pair (DPO/RLHF reward-model) dataset assembly: given
    scored candidate responses per prompt — a best-of-n sampling run, a
    merged instruction set with reward scores, human ratings — emit one
    (chosen, rejected) pair per prompt: the highest- vs lowest-scored
    response. The standard reduction public DPO sets use (one maximal-
    contrast pair per prompt beats all-pairs: quadratic blowup, and the
    near-tie pairs carry noise, not signal).

    Determinism contract: chosen = lexicographic max of
    ``(score, id)`` (tie → larger id), rejected = min (tie → smaller
    id), so with ≥2 candidates chosen ≠ rejected even under full score
    ties, and a retry assembles the identical set. Prompts with fewer
    than 2 candidates, a NULL/'' prompt, or ``margin < min_margin``
    emit nothing — low-contrast pairs are the caller's knob, not a
    silent default. NULL scores sort below every real score: they can
    still be the rejected side (a failed generation IS a rejection
    signal — such pairs carry a NULL margin and always pass the margin
    gate, being maximal contrast), but a NULL-scored chosen side
    (every candidate unscored) emits nothing.

    Output: ``(prompt, chosen_id, rejected_id, chosen, rejected,
    chosen_score, rejected_score, margin, n_candidates)`` with margin
    rounded to the 1e-6 grid (DuckDB-replayable —
    ``corpus_filter_stats`` kind='dpo').

    Scale shape: ONE partial-aggregated groupBy on the prompt — the
    min/max structs collapse map-side, so a viral prompt with 10^6
    sampled responses costs map-side tournaments, never a window over
    a skewed key or a per-prompt array."""
    prompt = F.coalesce(F.col(prompt_col), F.lit(""))
    # NULL scores → -inf so the struct tournament is total; the flag
    # records NULLness so scores can be surfaced as NULL again
    s = F.col(score_col).cast("double")
    key = F.struct(
        F.coalesce(s, F.lit(float("-inf"))).alias("s"),
        F.col(id_col).alias("i"),
        s.isNotNull().alias("ok"),
        F.col(response_col).alias("r"))
    agg = (df.filter(prompt != "")
           .groupBy(prompt.alias("prompt"))
           .agg(F.max(key).alias("__c"), F.min(key).alias("__r"),
                F.count(F.lit(1)).cast("int").alias("n_candidates")))
    margin = F.round(F.col("__c.s") - F.col("__r.s"), 6)
    kept = (agg.filter(F.col("n_candidates") >= 2)
            .filter(F.col("__c.ok") &
                    F.when(F.col("__r.ok"),
                           margin >= F.lit(float(min_margin)))
                    .otherwise(F.lit(True))))
    return (kept
            .select("prompt",
                    F.col("__c.i").alias("chosen_id"),
                    F.col("__r.i").alias("rejected_id"),
                    F.col("__c.r").alias("chosen"),
                    F.col("__r.r").alias("rejected"),
                    F.when(F.col("__c.ok"), F.col("__c.s"))
                    .alias("chosen_score"),
                    F.when(F.col("__r.ok"), F.col("__r.s"))
                    .alias("rejected_score"),
                    F.when(F.col("__c.ok") & F.col("__r.ok"), margin)
                    .alias("margin"),
                    "n_candidates"))


def offset_spans(spans: Column, offset: Column) -> Column:
    """Shift loss-mask spans by a pack offset — the glue between
    ``assistant_spans`` and ``textstats.pack_samples_whole``: when a
    rendered sample lands at ``pack_offset`` inside its training
    sequence, its spans move with it. Pure transform."""
    return F.transform(
        spans, lambda s: F.struct(
            (s["start"] + offset).cast("int").alias("start"),
            (s["end"] + offset).cast("int").alias("end")))
