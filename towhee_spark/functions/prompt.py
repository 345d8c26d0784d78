"""Prompt construction ops — parity with Towhee's prompt hub ops
(towhee/runtime/hub_ops/prompt.py:22-119: `template` renders a template
over named columns; `question_answer` assembles chat-message dicts with
optional history) as native Column expressions.

LLM call ops (hub_ops/llm.py) are deliberately out of the engine: they are
external service calls, not data-processing; the message-building half is
what a 100 TB prompt-assembly pipeline runs."""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def template(tmpl: str, **cols: Column | str) -> Column:
    """Render '{name}' placeholders from columns, fully JVM-side.

    template('Q: {q} A: {a}', q=F.col('question'), a=F.col('answer'))
    compiles to one format_string expression."""
    names = re.findall(r"\{([A-Za-z_][A-Za-z_0-9]*)\}", tmpl)
    missing = [n for n in names if n not in cols]
    if missing:
        raise ValueError(f"template placeholders without columns: {missing}")
    # literal % must survive format_string's Java Formatter
    fmt = re.sub(r"\{[A-Za-z_][A-Za-z_0-9]*\}", "%s", tmpl.replace("%", "%%"))
    args = [F.col(cols[n]) if isinstance(cols[n], str) else cols[n] for n in names]
    return F.format_string(fmt, *args)


def question_answer(
    question: Column | str,
    context: Column | str | None = None,
    system: str | None = None,
) -> Column:
    """Chat-message array: array<struct<role,content>> mirroring
    prompt.question_answer's output shape (list of role/content dicts)."""
    q = F.col(question) if isinstance(question, str) else question
    msgs = []
    if system:
        msgs.append(F.struct(F.lit("system").alias("role"), F.lit(system).alias("content")))
    if context is not None:
        c = F.col(context) if isinstance(context, str) else context
        content = F.format_string("Use the context to answer.\nContext: %s\nQuestion: %s", c, q)
    else:
        content = q
    msgs.append(F.struct(F.lit("user").alias("role"), content.alias("content")))
    return F.array(*msgs)


def conversation_prompt(
    df,
    key: str = "conv_id",
    role: str = "role",
    text: str = "text",
    order=("ts", "turn_idx"),
    out: str = "prompt",
    max_turns: int | None = None,
):
    """Per-conversation prompt assembly: collect ordered (role, text) turns
    into one chat transcript string — the transcript-table analogue of
    history-bearing question_answer. One shuffle (the groupBy).

    ``max_turns`` keeps the LAST N turns (a history-bearing prompt needs
    the recent exchanges; keeping the first N silently dropped exactly the
    context the prompt exists to carry — code-review finding)."""
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy(key).orderBy(*order)
    line = F.format_string("%s: %s", F.col(role), F.coalesce(F.col(text), F.lit("")))
    df2 = df.withColumn("__line", line).withColumn("__rn", F.row_number().over(w))
    if max_turns is not None:
        order_cols = [order] if isinstance(order, str) else list(order)
        w_desc = Window.partitionBy(key).orderBy(
            *[F.col(c).desc() for c in order_cols])
        df2 = df2.withColumn("__rn_last", F.row_number().over(w_desc)) \
                 .filter(F.col("__rn_last") <= max_turns).drop("__rn_last")
    # collect_list gives NO ordering guarantee → collect (rn, line) structs
    # and array_sort before joining (struct sort is field-ordered, rn first)
    lines = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("__rn"), F.col("__line")))),
        lambda s: s["__line"],
    )
    return df2.groupBy(key).agg(F.array_join(lines, "\n").alias(out))
