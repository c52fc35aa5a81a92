select * from {{ ref('pricing_summary') }} where revenue <= 0
