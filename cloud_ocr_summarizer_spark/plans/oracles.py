"""DuckDB SQL twins for plans/queries.py — the driver's correctness gate.

Each SQL string runs on DuckDB views named after the parquet tables
(documents, events, lineitem, ...).  The derived-spans CTE mirrors
datagen.derive_spans_from_documents 1:1 — keep them in lockstep.

Type conventions (to match Spark output schemas):
* counts from F.count -> BIGINT (DuckDB count(*) already is);
* sums of ints -> CAST(... AS BIGINT) (DuckDB sum() returns HUGEINT);
* F.size / row_number seq -> CAST(... AS INT);
* rounded doubles -> round(x, n) both sides;
* timestamps compared as epoch microseconds (engine-TZ-proof).
"""

# Mirrors derive_spans_from_documents (datagen.py): 8-word chunks, every
# (doc_id*31 + i) % 4 == 0 span is media, extensions rotate png/jpg/bin.
SPANS_CTE = r"""
WITH __base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), w -> w <> '') AS words
  FROM documents
), __spans AS (
  SELECT doc_id, s.off AS off, s.is_media AS is_media,
         CASE WHEN s.is_media THEN NULL ELSE s.chunk END AS text,
         CASE WHEN s.is_media THEN 'gs://corpus/' || doc_id || '/' || s.off ||
              CASE s.off % 3 WHEN 0 THEN '.png' WHEN 1 THEN '.jpg' ELSE '.bin' END
         END AS media_ref,
         CASE WHEN s.is_media THEN 'PICTURE' ELSE 'TEXT' END AS kind
  FROM (
    SELECT doc_id,
           unnest(list_transform(range((len(words) + 7) // 8),
             i -> struct_pack(
                  off := CAST(i AS INT),
                  is_media := ((doc_id * 31 + i) % 4 = 0),
                  chunk := array_to_string(words[i*8+1 : i*8+8], ' ')))) AS s
    FROM __base
  )
)
"""

_TOKENS = r"len(list_filter(regexp_split_to_array({col}, '\s+'), w -> w <> ''))"

ORACLES: dict[str, str] = {}

ORACLES["extract_flagship"] = SPANS_CTE + r"""
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY off) AS INT) AS seq,
       kind, text, media_ref, off AS "offset"
FROM __spans
"""

ORACLES["assemble_normalize"] = (
    r"""
SELECT doc_id,
       regexp_replace(regexp_replace(
         array_to_string(list_transform(string_split(text, chr(10)),
           p -> array_to_string(list_filter(regexp_split_to_array(p, '\s+'),
                                            w -> w <> ''), ' ')), chr(10)),
         '^\s+', ''), '\s+$', '') AS clean_text,
       CAST("""
    + _TOKENS.format(col="text")
    + r""" AS INT) AS n_tokens
FROM documents
"""
)

ORACLES["doc_structure_stats"] = SPANS_CTE + (
    r"""
SELECT doc_id,
       count(*) AS n_spans,
       CAST(sum(CASE WHEN NOT is_media THEN 1 ELSE 0 END) AS BIGINT) AS n_text_spans,
       CAST(sum(CASE WHEN is_media THEN 1 ELSE 0 END) AS BIGINT) AS n_media_spans,
       CAST(sum(CASE WHEN text IS NOT NULL THEN """
    + _TOKENS.format(col="text")
    + r""" ELSE 0 END) AS BIGINT) AS n_tokens
FROM __spans
GROUP BY doc_id
"""
)

ORACLES["rollup_per_doc"] = SPANS_CTE + r"""
SELECT doc_id,
       CASE WHEN count(*) FILTER (WHERE text IS NOT NULL AND text <> '') > 1
            THEN string_agg(text, chr(10) ORDER BY off)
                 FILTER (WHERE text IS NOT NULL AND text <> '')
       END AS rollup_text,
       CAST(count(*) FILTER (WHERE text IS NOT NULL AND text <> '') AS INT)
            AS n_contributing
FROM __spans
GROUP BY doc_id
"""

ORACLES["mime_dispatch"] = SPANS_CTE + r"""
SELECT CASE lower(regexp_extract(media_ref, '(\.[^./]+)$', 1))
         WHEN '.png' THEN 'image/png'
         WHEN '.jpg' THEN 'image/jpeg'
         WHEN '.jpeg' THEN 'image/jpeg'
         WHEN '.pdf' THEN 'application/pdf'
         ELSE 'application/octet-stream'
       END AS mime,
       count(*) AS n_refs
FROM __spans
WHERE media_ref IS NOT NULL
GROUP BY 1
"""

ORACLES["size_gate"] = r"""
SELECT doc_id,
       CAST(strlen(text) AS INT) AS text_bytes,
       strlen(text) <= 1500 AS within_limit
FROM documents
"""

ORACLES["confidence_filter"] = SPANS_CTE + r"""
SELECT doc_id,
       count(*) AS n_kept,
       round(avg(conf), 4) AS avg_conf
FROM (SELECT doc_id, ((doc_id * 7 + off * 13) % 100) / 100.0 AS conf FROM __spans)
WHERE conf >= 0.7
GROUP BY doc_id
"""

ORACLES["primary_language_by_source"] = r"""
WITH per AS (
  SELECT source, lang, CAST(sum(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY 1, 2
)
SELECT source, lang AS primary_lang, chars
FROM (SELECT *, row_number() OVER (PARTITION BY source
          ORDER BY chars DESC, lang ASC) AS rn FROM per)
WHERE rn = 1
"""

ORACLES["latest_event_per_user"] = r"""
SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
          ORDER BY ts DESC, event_id DESC) AS rn FROM events)
WHERE rn = 1
"""
