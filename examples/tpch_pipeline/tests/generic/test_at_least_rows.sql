{% test at_least_rows(model, column_name, floor='0') %}
-- project-file generic test (r9): fails when the model has fewer than
-- `floor` non-null values of the column — the SELECT names failing rows
select count({{ column_name }}) as n_values
from {{ model }}
having count({{ column_name }}) < {{ floor }}
{% endtest %}
