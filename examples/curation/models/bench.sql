{{ config(materialized='table') }}
-- the held-out eval bench: never a candidate; drives decontamination
select * from {{ ref('aug') }} where doc_id % 97 = 0
