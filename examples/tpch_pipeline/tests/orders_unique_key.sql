select o_orderkey, count(*) as n from {{ ref('stg_orders') }}
group by o_orderkey having count(*) > 1
