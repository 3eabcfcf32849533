"""RFC-822 / MIME e-mail parsing (message/rfc822, ``.eml``).

The reference reaches e-mail bodies through Tika and pulls addresses
with context regexes (enhance_extract_email.py:24-38); PST containers
explode into bare-number children renamed ``.eml`` (enhance_pst.py:
100-108) which then re-enter the pipeline as documents. This module is
the in-engine replacement: stdlib ``email`` parsing (policy.default —
RFC 2047 header decode, quoted-printable/base64 transfer decode)
inside the same Arrow-batched UDFs as every other extractor.

Field mapping (the reference's Solr names):
  From addr-specs            → ``message_from_ss``
  To + Cc addr-specs         → ``message_to_ss``
  Subject (RFC 2047 decoded) → ``subject_txt`` (Tika maps it to title)
  Date → UTC ISO             → ``message_dt``
  body                       → ``content_txt``: the first non-attachment
    ``text/plain`` part, transfer-decoded; when only HTML exists the
    part routes through the HTML extractor (operators/htmlx.py), same
    as any web payload.
"""

from __future__ import annotations

from email import policy
from email.parser import BytesParser
from email.utils import getaddresses, parsedate_to_datetime

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EML_RESULT_TYPE = T.StructType(
    [
        T.StructField("message_from_ss", T.ArrayType(T.StringType()), True),
        T.StructField("message_to_ss", T.ArrayType(T.StringType()), True),
        T.StructField("subject_txt", T.StringType(), True),
        T.StructField("message_dt", T.StringType(), True),
        T.StructField("content_txt", T.StringType(), True),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("err", T.StringType(), True),
    ]
)


def _addrs(msg, headers: tuple[str, ...]) -> list[str]:
    """addr-spec list for the given headers, document order, deduped."""
    vals = []
    for h in headers:
        vals.extend(msg.get_all(h) or [])
    out: list[str] = []
    for _name, addr in getaddresses(vals):
        if addr and addr not in out:
            out.append(addr)
    return out


def _body_text(msg) -> str:
    """first NON-EMPTY non-attachment text/plain part (transfer-
    decoded); falls back to the first text/html part run through the
    HTML extractor, then to a TNEF winmail.dat attachment (Outlook rich
    mail puts the real body there — [MS-OXTNEF], operators/cfb.py
    extract_tnef). An empty/whitespace plain part must NOT short-
    circuit the fallbacks: many mailers emit multipart/alternative with
    a blank text/plain placeholder next to the real HTML body."""
    html_part = None
    tnef_part = None
    for part in msg.walk():
        if part.is_multipart():
            continue
        ctype = part.get_content_type()
        if part.get_content_disposition() == "attachment":
            if tnef_part is None and (
                ctype in ("application/ms-tnef", "application/vnd.ms-tnef")
                or (part.get_filename() or "").lower() == "winmail.dat"
            ):
                tnef_part = part
            continue
        if ctype == "text/plain":
            try:
                plain = part.get_content()
            except Exception:  # noqa: BLE001 — bogus charset= is everyday
                # real-world mail (charset=x-user-defined, ansi_x3.…):
                # transfer-decode and read as cp1252 instead of failing
                # the whole document
                plain = (part.get_payload(decode=True) or b"").decode(
                    "cp1252", "replace"
                )
            if plain and plain.strip():
                return plain
        if ctype == "text/html" and html_part is None:
            html_part = part
    if html_part is not None:
        from open_semantic_etl_spark.operators.htmlx import extract_html

        payload = html_part.get_payload(decode=True) or b""
        return extract_html(payload)["content"]
    if tnef_part is not None:
        from open_semantic_etl_spark.operators.cfb import extract_tnef

        t = extract_tnef(tnef_part.get_payload(decode=True) or b"")
        if t is not None:
            return t["content"]
    return ""


def parse_eml(data: bytes | None) -> dict:
    """total function: parse failures land in (ok=False, err), never an
    exception — the per-row error-column contract."""
    res = {
        "message_from_ss": [],
        "message_to_ss": [],
        "subject_txt": None,
        "message_dt": None,
        "content_txt": "",
        "ok": True,
        "err": None,
    }
    try:
        if not data:
            return res
        msg = BytesParser(policy=policy.default).parsebytes(bytes(data))
        res["message_from_ss"] = _addrs(msg, ("From",))
        res["message_to_ss"] = _addrs(msg, ("To", "Cc"))
        subj = msg.get("Subject")
        res["subject_txt"] = str(subj) if subj else None
        d = msg.get("Date")
        if d:
            try:
                dt = parsedate_to_datetime(d)
                if dt.tzinfo is not None:
                    from datetime import timezone

                    dt = dt.astimezone(timezone.utc)
                res["message_dt"] = dt.strftime("%Y-%m-%dT%H:%M:%SZ")
            except (TypeError, ValueError):
                pass
        res["content_txt"] = _body_text(msg).rstrip("\r\n")
    except Exception as e:  # noqa: BLE001
        res["ok"] = False
        res["err"] = f"{type(e).__name__}: {e}"
    return res


_SKIP_ROW = {
    "message_from_ss": None,
    "message_to_ss": None,
    "subject_txt": None,
    "message_dt": None,
    "content_txt": None,
    "ok": True,
    "err": None,
}


def eml_expr(bytes_col: Column, gate: Column | None = None) -> Column:
    """struct-typed extraction column (Arrow-batched). ``gate`` rides
    INTO the UDF as a boolean column so non-mail rows skip the parser
    inside the batch (an outer when() would not help — Spark evaluates
    Python UDFs under a CASE eagerly for every row)."""

    def run(series: pd.Series, gates: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [parse_eml(b) if g else _SKIP_ROW for b, g in zip(series, gates)]
        )

    g = F.lit(True) if gate is None else gate.cast("boolean")
    return F.pandas_udf(run, EML_RESULT_TYPE)(bytes_col, g)


def with_eml(
    df: DataFrame, bytes_col: str = "html", gate: Column | None = None
) -> DataFrame:
    """append the e-mail fields; ``gate`` (e.g. url LIKE '%.eml')
    short-circuits non-mail rows to null fields without parsing."""
    df = df.withColumn("_eml", eml_expr(F.col(bytes_col), gate))
    return df.select(
        "*",
        F.col("_eml.message_from_ss").alias("message_from_ss"),
        F.col("_eml.message_to_ss").alias("message_to_ss"),
        F.col("_eml.subject_txt").alias("subject_txt"),
        F.col("_eml.message_dt").alias("message_dt"),
        F.col("_eml.content_txt").alias("body_txt"),
    ).drop("_eml")
