{{ config(materialized='table') }}
-- perplexity survivors kept by the DSIR cut. Materialized as a TABLE:
-- the downstream dedup stage's connected-components iterations would
-- re-execute a view's whole lineage per round.
select ps.* from {{ ref('ppl_survivors') }} ps
join {{ ref('dsir') }} d on ps.doc_id = d.doc_id
where d.dsir_keep
