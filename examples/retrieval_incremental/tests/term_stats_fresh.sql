-- the serving invariant as a data-quality node (r17): every distinct
-- (term, doc) pair is exactly one posting row AND one df unit, so
-- sum(df) over the term-stats artifact must equal the posting store's
-- row count — a stats store that missed a batch or double-folded one
-- fails this test and BLOCKS downstream serving (build runs tests with
-- blocking edges). The SQL twin of Retrieval.requireFreshTermStats.
select s.sum_df, p.n_postings
from (select coalesce(sum(df), 0) as sum_df from {{ ref('term_stats') }}) s,
     (select count(*) as n_postings from {{ ref('postings') }}) p
where s.sum_df <> p.n_postings
