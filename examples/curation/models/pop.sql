{{ config(materialized='table') }}
-- the candidate population
select * from {{ ref('aug') }} where doc_id % 97 != 0
