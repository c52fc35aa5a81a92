{{ config(materialized='table') }}
-- population rows surviving the stage 1-4 battery
select p.* from {{ ref('pop') }} p
join {{ ref('rules') }} r on p.doc_id = r.doc_id
where r.rules_pass
