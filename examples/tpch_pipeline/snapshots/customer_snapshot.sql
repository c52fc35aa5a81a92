{{ config(strategy='check', unique_key='c_custkey', check_cols='all', snapshot_at='2026-01-01T00:00:00Z') }}
select c_custkey, c_name, c_mktsegment, c_acctbal from {{ source('tpch', 'customer') }}
