{{ config(materialized='table', buckets=4, bucket_by='o_orderkey', tags='mart') }}
select o_orderkey, o_custkey, o_totalprice
from {{ ref('stg_orders') }}
