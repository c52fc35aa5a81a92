{{ config(materialized='materialized_view', tags='mart') }}
select l_returnflag,
  cast(sum(cast(l_quantity as decimal(18,4))) as double) as total_qty,
  count(*) as n_lines
from {{ ref('stg_lineitem') }}
group by l_returnflag
