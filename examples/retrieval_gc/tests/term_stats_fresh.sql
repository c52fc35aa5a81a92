-- the serving invariant as a data-quality node (r17): sum(df) over the
-- term-stats artifact must equal the posting store's row count. The
-- invariant holds at EVERY stage of this project — after ingest
-- (disjoint-id appends add both sides equally) and after GC (every
-- posting delete is paired with its negative df append). Under `build`
-- the test-blocking edges order this test strictly BEFORE gc_compact
-- (the operation refs term_stats, so it waits for the store's tests),
-- so it validates the post-ingest state with no chance of reading one
-- store mid-operation; the post-GC half of the invariant is asserted
-- by the gate's requireFreshTermStats call.
select s.sum_df, p.n_postings
from (select coalesce(sum(df), 0) as sum_df from {{ ref('term_stats') }}) s,
     (select count(*) as n_postings from {{ ref('postings') }}) p
where s.sum_df <> p.n_postings
