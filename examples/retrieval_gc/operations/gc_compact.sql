{{ config(schedule='build') }}

-- Fold the deletion feed out of the retrieval stores through the
-- engine's SQL DML surface. Statement order is the idempotency
-- contract: the compensating term-stats append runs FIRST, witnessed
-- by doc_lens (a doc already folded out compensates nothing), and the
-- doc_lens delete runs LAST because it IS the witness. Re-running the
-- whole operation against unchanged stores is a no-op.
--
-- ref_changes (r18): the deletion feed is consumed as a CDC WINDOW —
-- only rows appended since this operation last completed — so a build
-- with no new deletions renders every statement against an empty feed
-- and touches ZERO store files (no probe scans, no delete attachments,
-- no compensation rows). The doc_lens EXISTS witness stays as the
-- replay safety net: a crash-resumed window, a manual `run-operation`
-- (which reads the whole feed), or a cursor reset (delete
-- _graft_ops/gc_compact.cursors.json — the documented lever after a
-- lookback re-ingest resurrects already-deleted rows) all compensate
-- nothing twice.
--
-- __graft_batch mirrors the microbatch partition-value law exactly
-- (date_trunc to the store's day batch_size, as Microbatch.stageOne
-- writes it): a non-midnight event_ts must land its compensation rows
-- in the SAME partition as the ingest rows they negate, or a
-- lookback>0 re-ingest's partition clear would miss them and
-- re-compensation would double-subtract df.
INSERT INTO {{ ref('term_stats') }} (event_ts, term, df, __graft_batch)
SELECT event_ts, term, -count(*) AS df,
       date_format(date_trunc('day', event_ts), "yyyy-MM-dd'T'HH") AS __graft_batch
-- witness shape (r18, probe-measured at 450k): the witness is an INNER
-- join against the unique-keyed doc_lens (one row per doc — identical
-- semantics to EXISTS) with the O(new deletions) window BROADCAST. An
-- EXISTS would plan as a left-semi whose build side is the
-- CORPUS-SIZED store: beyond the broadcast threshold both sides
-- shuffle O(corpus) however small the window (513k vs 177k shuffle
-- rows at 450k docs — SCALE.md r18). The hinted window never exceeds
-- broadcast by construction: it is the CDC delta, not the feed.
FROM (
  SELECT /*+ BROADCAST(d) */ d.doc_id, d.event_ts,
         explode(array_distinct(CASE WHEN trim(d.text) = ''
           THEN array() ELSE split(trim(d.text), '\\s+') END)) AS term
  FROM {{ ref_changes('deletions') }} d
  JOIN (SELECT doc_id FROM {{ ref('doc_lens') }}) l USING (doc_id)
)
GROUP BY event_ts, term

;;

DELETE FROM {{ ref('postings') }}
WHERE doc_id IN (SELECT doc_id FROM {{ ref_changes('deletions') }})

;;

DELETE FROM {{ ref('doc_lens') }}
WHERE doc_id IN (SELECT doc_id FROM {{ ref_changes('deletions') }})

;;

-- reclaim: departed documents' bytes leave STORAGE too, not only the
-- serving view — the catalog's stored-procedure surface (CALL) runs
-- the commit-log vacuum inside the same scheduled operation.
-- keep_versions=2 retains one step of time travel past the GC commit.
CALL {{ var('graft_catalog') }}.system.vacuum(table => 'main.postings', keep_versions => 2)

;;

CALL {{ var('graft_catalog') }}.system.vacuum(table => 'main.doc_lens', keep_versions => 2)
