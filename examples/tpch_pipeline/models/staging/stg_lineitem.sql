select l_orderkey, l_quantity, l_extendedprice, l_discount, l_returnflag, l_linestatus, l_shipdate
from {{ source('tpch', 'lineitem') }}
