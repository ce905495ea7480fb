"""Query-language front end: nGQL (GO/FETCH/LOOKUP/FIND PATH/GET SUBGRAPH/
YIELD + pipes) and an openCypher-flavored MATCH subset, compiled onto the
operator library.

Reference pipeline (SURVEY.md §3): flex/bison grammar
(``src/parser/parser.yy``, ``scanner.lex``) → Sentence AST
(``src/parser/Sentence.h:30-137``) → Validators → Planner → PlanNode DAG.
Here: regex lexer → recursive-descent parser → small AST → direct emission
of DataFrame transformations (the Catalyst-era answer to the reference's
plan DAG; SURVEY.md §4 explains why the memo optimizer is deleted).
"""

from nebula_spark.plans.ngql import parse  # noqa: F401
from nebula_spark.plans.executor import execute, explain  # noqa: F401
