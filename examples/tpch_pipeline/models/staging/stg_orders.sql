select o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
from {{ source('tpch', 'orders') }}
