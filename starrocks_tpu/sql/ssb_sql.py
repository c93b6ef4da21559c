"""The 13 SSB-Flat queries (reference: docs/en/benchmarking/SSB_Benchmarking.md
runs these against `lineorder_flat`; text follows the standard SSB flat
formulation)."""

QUERIES = {
    "q1.1": """
        select sum(lo_extendedprice * lo_discount) as revenue
        from lineorder_flat
        where year(lo_orderdate) = 1993 and lo_discount between 1 and 3
          and lo_quantity < 25
    """,
    "q1.2": """
        select sum(lo_extendedprice * lo_discount) as revenue
        from lineorder_flat
        where year(lo_orderdate) = 1994 and month(lo_orderdate) = 1
          and lo_discount between 4 and 6 and lo_quantity between 26 and 35
    """,
    "q1.3": """
        select sum(lo_extendedprice * lo_discount) as revenue
        from lineorder_flat
        where weekofyear(lo_orderdate) = 6 and year(lo_orderdate) = 1994
          and lo_discount between 5 and 7 and lo_quantity between 26 and 35
    """,
    "q2.1": """
        select sum(lo_revenue) as lo_revenue, year(lo_orderdate) as d_year, p_brand
        from lineorder_flat
        where p_category = 'MFGR#12' and s_region = 'AMERICA'
        group by d_year, p_brand
        order by d_year, p_brand
    """,
    "q2.2": """
        select sum(lo_revenue) as lo_revenue, year(lo_orderdate) as d_year, p_brand
        from lineorder_flat
        where p_brand >= 'MFGR#2221' and p_brand <= 'MFGR#2228' and s_region = 'ASIA'
        group by d_year, p_brand
        order by d_year, p_brand
    """,
    "q2.3": """
        select sum(lo_revenue) as lo_revenue, year(lo_orderdate) as d_year, p_brand
        from lineorder_flat
        where p_brand = 'MFGR#2239' and s_region = 'EUROPE'
        group by d_year, p_brand
        order by d_year, p_brand
    """,
    "q3.1": """
        select c_nation, s_nation, year(lo_orderdate) as d_year,
               sum(lo_revenue) as lo_revenue
        from lineorder_flat
        where c_region = 'ASIA' and s_region = 'ASIA'
          and lo_orderdate >= date '1992-01-01' and lo_orderdate <= date '1997-12-31'
        group by c_nation, s_nation, d_year
        order by d_year asc, lo_revenue desc
    """,
    "q3.2": """
        select c_city, s_city, year(lo_orderdate) as d_year,
               sum(lo_revenue) as lo_revenue
        from lineorder_flat
        where c_nation = 'UNITED STATES' and s_nation = 'UNITED STATES'
          and lo_orderdate >= date '1992-01-01' and lo_orderdate <= date '1997-12-31'
        group by c_city, s_city, d_year
        order by d_year asc, lo_revenue desc
    """,
    "q3.3": """
        select c_city, s_city, year(lo_orderdate) as d_year,
               sum(lo_revenue) as lo_revenue
        from lineorder_flat
        where (c_city = 'UNITED KI1' or c_city = 'UNITED KI5')
          and (s_city = 'UNITED KI1' or s_city = 'UNITED KI5')
          and lo_orderdate >= date '1992-01-01' and lo_orderdate <= date '1997-12-31'
        group by c_city, s_city, d_year
        order by d_year asc, lo_revenue desc
    """,
    "q3.4": """
        select c_city, s_city, year(lo_orderdate) as d_year,
               sum(lo_revenue) as lo_revenue
        from lineorder_flat
        where (c_city = 'UNITED KI1' or c_city = 'UNITED KI5')
          and (s_city = 'UNITED KI1' or s_city = 'UNITED KI5')
          and year(lo_orderdate) = 1997 and month(lo_orderdate) = 12
        group by c_city, s_city, d_year
        order by d_year asc, lo_revenue desc
    """,
    "q4.1": """
        select year(lo_orderdate) as d_year, c_nation,
               sum(lo_revenue - lo_supplycost) as profit
        from lineorder_flat
        where c_region = 'AMERICA' and s_region = 'AMERICA'
          and (p_mfgr = 'MFGR#1' or p_mfgr = 'MFGR#2')
        group by d_year, c_nation
        order by d_year, c_nation
    """,
    "q4.2": """
        select year(lo_orderdate) as d_year, s_nation, p_category,
               sum(lo_revenue - lo_supplycost) as profit
        from lineorder_flat
        where c_region = 'AMERICA' and s_region = 'AMERICA'
          and (year(lo_orderdate) = 1997 or year(lo_orderdate) = 1998)
          and (p_mfgr = 'MFGR#1' or p_mfgr = 'MFGR#2')
        group by d_year, s_nation, p_category
        order by d_year, s_nation, p_category
    """,
    "q4.3": """
        select year(lo_orderdate) as d_year, s_city, p_brand,
               sum(lo_revenue - lo_supplycost) as profit
        from lineorder_flat
        where s_nation = 'UNITED STATES'
          and (year(lo_orderdate) = 1997 or year(lo_orderdate) = 1998)
          and p_category = 'MFGR#14'
        group by d_year, s_city, p_brand
        order by d_year, s_city, p_brand
    """,
}
