{{ config(schedule='build') }}

-- Fold the deletion feed out of the DEDUP stores through the engine's
-- SQL DML surface. Statement order is the idempotency contract: the
-- compensating negative gram_counts append runs FIRST, witnessed by
-- the fingerprint store (a doc already folded out compensates
-- nothing), and the fingerprint delete runs LAST because it IS the
-- witness. The deletion feed is consumed as a CDC WINDOW
-- (ref_changes): a build with no new deletions renders every
-- statement against an empty feed and touches zero store files.
--
-- The gram law mirrors cgc_gram_counts exactly — split on \s+, NOT
-- distinct (occurrence counts, not document frequency) — and
-- __graft_batch mirrors the microbatch partition-value law
-- (date_trunc to the day batch_size) so compensation rows land in the
-- partition a lookback re-ingest would clear.
INSERT INTO {{ ref('gram_counts') }} (event_ts, gram, cnt, __graft_batch)
SELECT event_ts, gram, -count(*) AS cnt,
       date_format(date_trunc('day', event_ts), "yyyy-MM-dd'T'HH") AS __graft_batch
-- witness shape (r18, probe-measured): INNER join against the
-- unique-keyed fingerprint store (one row per doc — identical
-- semantics to EXISTS) with the O(new deletions) window BROADCAST; an
-- EXISTS would pin the corpus-sized store as the semi-join build side
-- and shuffle O(corpus) beyond the broadcast threshold (SCALE.md r18).
FROM (
  SELECT /*+ BROADCAST(d) */ d.doc_id, d.event_ts,
         explode(CASE WHEN trim(d.text) = '' THEN array()
                 ELSE split(trim(d.text), '\\s+') END) AS gram
  FROM {{ ref_changes('deletions') }} d
  JOIN (SELECT doc_id FROM {{ ref('fingerprints') }}) f USING (doc_id)
)
GROUP BY event_ts, gram

;;

DELETE FROM {{ ref('sigs') }}
WHERE doc IN (SELECT doc_id FROM {{ ref_changes('deletions') }})

;;

DELETE FROM {{ ref('band_index') }}
WHERE doc IN (SELECT doc_id FROM {{ ref_changes('deletions') }})

;;

DELETE FROM {{ ref('simhash_store') }}
WHERE doc IN (SELECT doc_id FROM {{ ref_changes('deletions') }})

;;

DELETE FROM {{ ref('simhash_blocks') }}
WHERE doc IN (SELECT doc_id FROM {{ ref_changes('deletions') }})

;;

DELETE FROM {{ ref('fingerprints') }}
WHERE doc_id IN (SELECT doc_id FROM {{ ref_changes('deletions') }})

;;

-- reclaim: departed documents' bytes leave STORAGE inside the same
-- scheduled operation; keep_versions=2 retains one step of time
-- travel past the GC commit.
CALL {{ var('graft_catalog') }}.system.vacuum(table => 'main.band_index', keep_versions => 2)

;;

CALL {{ var('graft_catalog') }}.system.vacuum(table => 'main.fingerprints', keep_versions => 2)
