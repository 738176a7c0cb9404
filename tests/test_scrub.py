"""PII scrub / text normalization (rayfts/ops/scrub.py): known-answer
redactions, sequential-rule semantics, DuckDB RE2 parity on adversarial
strings, null/empty handling."""

import duckdb
import pandas as pd
import pytest


def _run(texts, **kw):
    import ray

    from rayfts.ops.scrub import scrub_text

    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))
    return scrub_text(ds, **kw).to_pandas().sort_values("doc_id")


def test_known_redactions(ray_session):
    out = _run([
        "mail bob.smith+x@corp.example.org now",
        "see https://a.example/p?q=1#frag and http://b.example too",
        "host 192.168.0.1 and 10.0.0.255 up",
        "plain text stays as is",
    ])
    assert out["text"].tolist() == [
        "mail <EMAIL> now",
        "see <URL> and <URL> too",
        "host <IP> and <IP> up",
        "plain text stays as is",
    ]
    assert out["n_email"].tolist() == [1, 0, 0, 0]
    assert out["n_url"].tolist() == [0, 2, 0, 0]
    assert out["n_ip"].tolist() == [0, 0, 2, 0]


def test_sequential_rules_email_inside_url(ray_session):
    # the mailto URL's email part is consumed by the EMAIL rule first;
    # the URL rule then matches the surviving https token
    out = _run(["ref https://x.example/a mailto me@y.example.com ok"])
    assert out["text"].iloc[0] == "ref <URL> mailto <EMAIL> ok"
    assert (out["n_email"].iloc[0], out["n_url"].iloc[0]) == (1, 1)


def test_whitespace_collapse_and_trim(ray_session):
    out = _run(["  a\t\tb\n\nc  ", "", None])
    assert out["text"].tolist() == ["a b c", "", ""]
    out2 = _run(["  a  b "], collapse_ws=False)
    assert out2["text"].iloc[0] == "  a  b "


def test_duckdb_re2_parity_adversarial(ray_session):
    texts = [
        "x a@b.co y c@d.io z https://e.f/g?h=i&j=k 1.2.3.4",
        "no-ip 1234.5.6.7 yes-ip 11.22.33.44 edge 999.999.999.999",
        "u@v.w-not-tld u@v.wx ok https://[brackets] http://q",
        "tab\thttps://t.example/x\tend",
    ]
    got = _run(texts)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    em = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    ur = r"https?://[^\s]+"
    ip = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    exp = con.sql(rf"""
WITH e AS (SELECT doc_id, len(regexp_extract_all(text, '{em}')) AS n_email,
                  regexp_replace(text, '{em}', '<EMAIL>', 'g') AS t FROM t),
u AS (SELECT doc_id, n_email, len(regexp_extract_all(t, '{ur}')) AS n_url,
             regexp_replace(t, '{ur}', '<URL>', 'g') AS t FROM e),
i AS (SELECT doc_id, n_email, n_url, len(regexp_extract_all(t, '{ip}')) AS n_ip,
             regexp_replace(t, '{ip}', '<IP>', 'g') AS t FROM u)
SELECT doc_id, trim(regexp_replace(t, '\s+', ' ', 'g')) AS text,
       n_email, n_url, n_ip FROM i ORDER BY doc_id""").df()
    assert got["text"].tolist() == exp["text"].tolist()
    for c in ("n_email", "n_url", "n_ip"):
        assert got[c].tolist() == exp[c].astype(int).tolist()


def test_rule_order_is_callers_order(ray_session):
    # url-first swallows the email inside the URL path; email-first
    # redacts it before the URL rule sees the line (review finding)
    t = ["go https://x.example/a@b.co now"]
    url_first = _run(t, rules=("url", "email"))
    assert url_first["text"].iloc[0] == "go <URL> now"
    assert (url_first["n_url"].iloc[0], url_first["n_email"].iloc[0]) == (1, 0)
    email_first = _run(t, rules=("email", "url"))
    assert email_first["text"].iloc[0] == "go <URL> now"
    assert (email_first["n_email"].iloc[0], email_first["n_url"].iloc[0]) == (1, 1)


def test_rule_subset_and_bad_rule(ray_session):
    import ray

    from rayfts.ops.scrub import scrub_text

    out = _run(["a@b.co https://x.y 1.2.3.4"], rules=("url",))
    assert out["text"].iloc[0] == "a@b.co <URL> 1.2.3.4"
    assert "n_email" not in out.columns
    ds = ray.data.from_pandas(pd.DataFrame({"text": ["x"]}))
    with pytest.raises(ValueError):
        scrub_text(ds, rules=("email", "ssn"))
