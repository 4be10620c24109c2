#!/usr/bin/env python3
"""Build an adversarial test corpus at /tmp/sf_adv: the driver's
sf0.001 tables with documents replaced by a version that adds PII,
exact duplicates, whitespace-only / single-char / very long /
punctuation-heavy docs, and non-ASCII (accents / CJK / emoji — the
mm oracles slice BYTES via hex(encode(text)), so multibyte payloads
must stay exact too). The full oracle gate should stay green on it:

    python3 tools/make_adv.py
    SPARK_GRAFT_CPUS=16 tools/run.sh graft.Verify /tmp/sf_adv /tmp/vo_adv
    python3 tools/check.py /tmp/sf_adv /tmp/vo_adv

This catches vacuously-green oracles (e.g. PII patterns that never
match the clean driver corpus) and ANSI-mode crashes (divide by
zero on token-less docs) that the driver's data cannot exercise.
"""
import duckdb, shutil, os

src = '/root/testdata/sf0.001'
dst = '/tmp/sf_adv'
os.makedirs(dst, exist_ok=True)
for f in os.listdir(src):
    if f not in ('documents.parquet', 'embeddings.parquet'):
        shutil.copy(f'{src}/{f}', f'{dst}/{f}')

# embeddings + a zero-norm vector (exercises every cosine path's
# divide-by-zero guard; NULL cosine must match DuckDB's x/0 -> NULL)
# and an exact duplicate vector (ties in every ranking path)
duckdb.sql(f"""
COPY (
  SELECT * FROM '{src}/embeddings.parquet'
  UNION ALL
  SELECT 9001, CAST(list_transform(range(1, 65), i -> 0.0) AS FLOAT[]), 'zero'
  UNION ALL
  SELECT 9002, (SELECT embedding FROM '{src}/embeddings.parquet' WHERE vec_id = 10), 'dup'
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
""")

duckdb.sql(f"""
COPY (
  WITH base AS (SELECT * FROM '{src}/documents.parquet'),
  adv(doc_id, text, lang, source) AS (VALUES
    (9001, 'contact me at john.doe+spam@example.org or call +1 555-123-4567 today', 'en', 'adv'),
    (9002, 'contact me at john.doe+spam@example.org or call +1 555-123-4567 today', 'en', 'adv'),
    (9003, '   ', 'en', 'adv'),
    (9004, 'x', 'en', 'adv'),
    (9005, repeat('the quick brown fox jumps over a lazy dog and ', 200), 'en', 'adv'),
    (9006, '!!! ??? ... ;;; ::: ,,, (((', 'en', 'adv'),
    (9007, 'one two three four five six seven eight nine ten one two three four five', 'en', 'adv'),
    (9008, 'one two three four five six seven eight nine ten one two three four six', 'en', 'adv'),
    (9009, 'mail a@b.co and c.d@e-f.org plus 555 867 5309 and (02) 1234-5678 done', 'en', 'adv'),
    (9010, 'café résumé naïve coöperate — ünïcödé tëst with àccents all över', 'fr', 'adv'),
    (9011, '数据 处理 引擎 测试 文档 内容 分析 质量 检查 完成', 'zh', 'adv'),
    (9012, 'emoji test 😀 rocket 🚀 and some mixed ascii plus ñ and ß endings', 'en', 'adv'),
    (9013, 'COOKIE BANNER' || chr(10) || 'real content thirteen' || chr(10) || 'FOOTER NAV', 'en', 'adv'),
    (9014, 'COOKIE BANNER' || chr(10) || 'real content fourteen' || chr(10) || 'FOOTER NAV', 'en', 'adv'),
    (9015, 'COOKIE BANNER' || chr(10) || 'real content fifteen' || chr(10) || 'FOOTER NAV', 'en', 'adv'),
    (9016, '<html><body><p>hello &amp; welcome</p><br/>plain tail</body></html>', 'en', 'adv'),
    (9017, '<div class="x y">nested <b>bold</b> &lt;escaped tag&gt; &quot;quoted&quot;</div>', 'en', 'adv'),
    (9018, 'no markup here but a stray &amp;&amp; and a < b comparison', 'en', 'adv'))
  SELECT doc_id, text, lang, source, length(text) AS n_chars FROM base
  UNION ALL
  SELECT doc_id, text, lang, source, length(text) FROM adv
) TO '{dst}/documents.parquet' (FORMAT PARQUET)
""")
print(f"wrote {dst}")
