"""Field matrix algebra on the host: rref / transpose / inverse.

(ref: /root/reference/src/utils/matrix.rs:5-108).  Used only at Rescue-Prime
setup time (m x 2m Vandermonde systems, m = 2), so plain Python ints suffice.
"""

from __future__ import annotations

from ..field import Field


def rref(field: Field, matrix: list[list[int]]) -> None:
    """In-place reduced row echelon form (ref: matrix.rs:5-50)."""
    p = field.order
    lead = 0
    row_count = len(matrix)
    column_count = len(matrix[0])
    for r in range(row_count):
        if column_count <= lead:
            return
        i = r
        while matrix[i][lead] % p == 0:
            i += 1
            if row_count == i:
                i = r
                lead += 1
                if column_count == lead:
                    return
        matrix[i], matrix[r] = matrix[r], matrix[i]
        pivot = matrix[r][lead] % p
        if pivot != 0:
            inv = pow(pivot, -1, p)
            matrix[r] = [el * inv % p for el in matrix[r]]
        for i in range(row_count):
            if i != r:
                hold = matrix[i][lead]
                for k in range(column_count):
                    matrix[i][k] = (matrix[i][k] - hold * matrix[r][k]) % p
        lead += 1


def transpose(matrix: list[list[int]]) -> list[list[int]]:
    return [list(col) for col in zip(*matrix)]


def inverse(field: Field, matrix: list[list[int]]) -> list[list[int]]:
    """Gauss-Jordan inverse via [A|I] (ref: matrix.rs:68-108)."""
    n = len(matrix)
    aug = []
    for i, row in enumerate(matrix):
        if len(row) != n:
            raise ValueError("inverse exists only for square matrices")
        ident = [0] * n
        ident[i] = 1
        aug.append(list(row) + ident)
    rref(field, aug)
    identity = [row[:n] for row in aug]
    result = [row[n:] for row in aug]
    for i, row in enumerate(identity):
        expect = [1 if j == i else 0 for j in range(n)]
        if row != expect:
            raise ValueError("could not construct identity to find inverse")
    return result
