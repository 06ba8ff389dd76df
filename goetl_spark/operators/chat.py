"""Conversation (SFT / chat) dataset operators.

Beyond the reference surface (BASELINE.json north star): instruction-
tuning pipelines process conversations — arrays of (role, content)
turns — rather than flat documents. The operators here validate turn
structure, compute per-role statistics, and render conversations to a
single training text with a chat template, all as pure Column
expressions over ``array<struct<role,content>>`` (zero UDFs, zero
shuffle beyond the scan — the shapes survive 100 TB unchanged).

- :func:`words_to_turns` — deterministic conversation builder (fixed
  word-count turns with alternating roles); the fixture/migration
  primitive for corpora that ship as flat text.
- :func:`chat_turn_stats` — turn counts, per-role char/token totals,
  alternation/start/end validity flags, and the ``chat_ok`` verdict
  (the pre-training-file gate an SFT pipeline runs before rendering).
- :func:`flatten_chat` — template rendering (``<|role|>content`` +
  separator per turn), the step that turns validated conversations
  into packable training documents.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def words_to_turns(
    text_col: str | Column,
    words_per_turn: int = 8,
    roles: Sequence[str] = ("user", "assistant"),
) -> Column:
    """Build an ``array<struct<role,content>>`` conversation from flat
    text: lowercase-alnum words are chunked ``words_per_turn`` at a
    time (last chunk ragged), roles cycling through ``roles``. Pure
    expression (split → sequence → slice → struct), deterministic, and
    list-slicing-replayable in oracle SQL."""
    if words_per_turn < 1:
        raise ValueError(f"words_per_turn must be >= 1, got {words_per_turn}")
    if len(roles) < 1:
        raise ValueError("roles must be non-empty")
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    words = F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda x: x != "")
    n_turns = F.ceil(F.size(words) / F.lit(words_per_turn)).cast("int")

    def turn(i: Column) -> Column:
        # i is 1-based turn index; roles cycle by (i-1) % len(roles)
        rmod = (i - 1) % len(roles)
        role = None
        for j, r in enumerate(roles):
            role = F.when(rmod == j, F.lit(r)) if role is None \
                else role.when(rmod == j, F.lit(r))
        content = F.concat_ws(
            " ", F.slice(words, (i - 1) * words_per_turn + 1,
                         words_per_turn))
        return F.struct(role.alias("role"), content.alias("content"))

    return F.when(n_turns > 0, F.transform(
        F.sequence(F.lit(1), F.greatest(n_turns, F.lit(1))), turn)
    ).otherwise(F.array().cast(
        "array<struct<role:string,content:string>>"))


def chat_turn_stats(
    df: DataFrame,
    conv_col: str = "conversation",
    min_turns: int = 2,
) -> DataFrame:
    """Per-conversation structural statistics and validity flags over an
    ``array<struct<role,content>>`` column. Appends:

    - ``n_turns``, ``n_user``, ``n_assistant`` (role counts);
    - ``user_chars`` / ``assistant_chars`` and ``user_tokens`` /
      ``assistant_tokens`` (whitespace-token counts per role — the
      budget numbers an SFT mixture is specified in);
    - ``starts_with_user``, ``ends_with_assistant``,
      ``alternation_ok`` (no two consecutive turns share a role), and
      ``chat_ok`` — the conjunction plus ``n_turns >= min_turns``; the
      standard SFT ingestion gate.

    All higher-order Column expressions: zero shuffle, zero UDFs,
    whole-stage-codegen, replayable with DuckDB list functions."""
    conv = F.col(conv_col)
    n = F.coalesce(F.size(conv), F.lit(0))

    def by_role(role: str) -> Column:
        return F.filter(conv, lambda t: t["role"] == role)

    def chars(arr: Column) -> Column:
        return F.aggregate(arr, F.lit(0),
                           lambda a, t: a + F.length(t["content"]))

    def toks(arr: Column) -> Column:
        return F.aggregate(
            arr, F.lit(0),
            lambda a, t: a + F.size(F.regexp_extract_all(
                t["content"], F.lit(r"\S+"), F.lit(0))))

    user, asst = by_role("user"), by_role("assistant")
    starts = F.when(n > 0, F.element_at(conv, 1)["role"] == "user") \
        .otherwise(F.lit(False))
    ends = F.when(n > 0, F.element_at(conv, -1)["role"] == "assistant") \
        .otherwise(F.lit(False))
    altern = F.when(n <= 1, F.lit(True)).otherwise(F.forall(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.element_at(conv, i)["role"]
        != F.element_at(conv, i + 1)["role"]))
    return (
        df.withColumn("n_turns", n)
        .withColumn("n_user", F.coalesce(F.size(user), F.lit(0)))
        .withColumn("n_assistant", F.coalesce(F.size(asst), F.lit(0)))
        .withColumn("user_chars", F.coalesce(chars(user), F.lit(0)))
        .withColumn("assistant_chars", F.coalesce(chars(asst), F.lit(0)))
        .withColumn("user_tokens", F.coalesce(toks(user), F.lit(0)))
        .withColumn("assistant_tokens", F.coalesce(toks(asst), F.lit(0)))
        .withColumn("starts_with_user", starts)
        .withColumn("ends_with_assistant", ends)
        .withColumn("alternation_ok", altern)
        .withColumn("chat_ok",
                    starts & ends & altern & (n >= F.lit(min_turns)))
    )


def flatten_chat(
    df: DataFrame,
    conv_col: str = "conversation",
    out_col: str = "text",
    header: tuple[str, str] = ("<|", "|>"),
    sep: str = "\n",
) -> DataFrame:
    """Render each conversation to one training text:
    ``header[0] + role + header[1] + content + sep`` per turn,
    concatenated in order — the template step between validation
    (:func:`chat_turn_stats`) and packing (sampling.py). Pure
    ``transform`` + ``array_join`` expression; DuckDB replays it with
    ``list_transform`` + ``array_to_string``."""
    conv = F.col(conv_col)
    rendered = F.array_join(
        F.transform(conv, lambda t: F.concat(
            F.lit(header[0]), t["role"], F.lit(header[1]),
            t["content"], F.lit(sep))), "")
    return df.withColumn(out_col, rendered)
