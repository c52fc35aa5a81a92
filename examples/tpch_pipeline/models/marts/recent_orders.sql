{{ config(materialized='incremental', incremental_strategy='merge', unique_key='o_orderkey', change_feed='true', tags='mart') }}
select * from {{ ref('stg_orders') }}
where o_orderdate >= timestamp'{{ var('cutoff') }} 00:00:00'
{% if is_incremental() %}
  and o_orderdate > (select max(o_orderdate) from {{ this }})
{% endif %}
