{{ config(materialized='table') }}
-- rule survivors that kept a head/middle perplexity bucket
select rs.* from {{ ref('rule_survivors') }} rs
join {{ ref('bucketed') }} b on rs.doc_id = b.doc_id
where b.ppl_bucket != 'tail'
