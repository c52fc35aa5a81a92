{{ config(materialized='table') }}
-- DSIR survivors that won (or never entered) a duplicate cluster
select ds.* from {{ ref('dsir_survivors') }} ds
join {{ ref('dedup_kept') }} k on ds.doc_id = k.doc_id
where k.dup_survivor
