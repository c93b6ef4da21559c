"""TPC-DS data generator (spec-domain, scaled-down).

Analog of the reference's TPC-DS benchmark setup (docs/en/benchmarking/
TPC_DS_Benchmark.md; schema test/common/sql/tpcds/create.sql — the public
TPC-DS v2 schema). Like io/ssb.py, this is a spec-domain generator: value
domains follow the public benchmark spec closely enough that every literal
predicate in the 99 queries is satisfiable (categories, classes, colors,
states, counties, meal times, quarter names, buy potentials, ...), while
row counts scale with `sf` so exact-match tests stay fast.

Conventions that queries rely on:
- d_date_sk is the Julian day number of d_date (the official dsdgen
  convention: some published queries carry raw date-sk literals).
- d_month_seq = months since 1900-01 (2000-01 -> 1200, as in the spec).
- customer_demographics is the full categorical cross product so any
  (gender, marital, education, ...) combination exists.
- returns reference real sales rows (shared ticket/order number + item),
  ship dates trail sold dates by 1..120 days (the q62/q99 lag buckets).
- Decimal(7,2) money columns are generated in integer cents (exact in both
  the engine's scaled-int64 decimals and float64 goldens at test scales).
"""

from __future__ import annotations

import numpy as np

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table

# --------------------------------------------------------------------------
# schema: table -> [(column, type)]; type: int | date | str | dec2
# (from the public TPC-DS DDL, mirrored by the reference's
# test/common/sql/tpcds/create.sql)
# --------------------------------------------------------------------------

SCHEMA = {
    'customer_address': [
        ('ca_address_sk', 'int'), ('ca_address_id', 'str'),
        ('ca_street_number', 'str'), ('ca_street_name', 'str'),
        ('ca_street_type', 'str'), ('ca_suite_number', 'str'),
        ('ca_city', 'str'), ('ca_county', 'str'), ('ca_state', 'str'),
        ('ca_zip', 'str'), ('ca_country', 'str'), ('ca_gmt_offset', 'dec2'),
        ('ca_location_type', 'str'),
    ],
    'customer_demographics': [
        ('cd_demo_sk', 'int'), ('cd_gender', 'str'),
        ('cd_marital_status', 'str'), ('cd_education_status', 'str'),
        ('cd_purchase_estimate', 'int'), ('cd_credit_rating', 'str'),
        ('cd_dep_count', 'int'), ('cd_dep_employed_count', 'int'),
        ('cd_dep_college_count', 'int'),
    ],
    'date_dim': [
        ('d_date_sk', 'int'), ('d_date_id', 'str'), ('d_date', 'date'),
        ('d_month_seq', 'int'), ('d_week_seq', 'int'), ('d_quarter_seq', 'int'),
        ('d_year', 'int'), ('d_dow', 'int'), ('d_moy', 'int'), ('d_dom', 'int'),
        ('d_qoy', 'int'), ('d_fy_year', 'int'), ('d_fy_quarter_seq', 'int'),
        ('d_fy_week_seq', 'int'), ('d_day_name', 'str'),
        ('d_quarter_name', 'str'), ('d_holiday', 'str'), ('d_weekend', 'str'),
        ('d_following_holiday', 'str'), ('d_first_dom', 'int'),
        ('d_last_dom', 'int'), ('d_same_day_ly', 'int'),
        ('d_same_day_lq', 'int'), ('d_current_day', 'str'),
        ('d_current_week', 'str'), ('d_current_month', 'str'),
        ('d_current_quarter', 'str'), ('d_current_year', 'str'),
    ],
    'warehouse': [
        ('w_warehouse_sk', 'int'), ('w_warehouse_id', 'str'),
        ('w_warehouse_name', 'str'), ('w_warehouse_sq_ft', 'int'),
        ('w_street_number', 'str'), ('w_street_name', 'str'),
        ('w_street_type', 'str'), ('w_suite_number', 'str'), ('w_city', 'str'),
        ('w_county', 'str'), ('w_state', 'str'), ('w_zip', 'str'),
        ('w_country', 'str'), ('w_gmt_offset', 'dec2'),
    ],
    'ship_mode': [
        ('sm_ship_mode_sk', 'int'), ('sm_ship_mode_id', 'str'),
        ('sm_type', 'str'), ('sm_code', 'str'), ('sm_carrier', 'str'),
        ('sm_contract', 'str'),
    ],
    'time_dim': [
        ('t_time_sk', 'int'), ('t_time_id', 'str'), ('t_time', 'int'),
        ('t_hour', 'int'), ('t_minute', 'int'), ('t_second', 'int'),
        ('t_am_pm', 'str'), ('t_shift', 'str'), ('t_sub_shift', 'str'),
        ('t_meal_time', 'str'),
    ],
    'reason': [
        ('r_reason_sk', 'int'), ('r_reason_id', 'str'),
        ('r_reason_desc', 'str'),
    ],
    'income_band': [
        ('ib_income_band_sk', 'int'), ('ib_lower_bound', 'int'),
        ('ib_upper_bound', 'int'),
    ],
    'item': [
        ('i_item_sk', 'int'), ('i_item_id', 'str'),
        ('i_rec_start_date', 'date'), ('i_rec_end_date', 'date'),
        ('i_item_desc', 'str'), ('i_current_price', 'dec2'),
        ('i_wholesale_cost', 'dec2'), ('i_brand_id', 'int'),
        ('i_brand', 'str'), ('i_class_id', 'int'), ('i_class', 'str'),
        ('i_category_id', 'int'), ('i_category', 'str'),
        ('i_manufact_id', 'int'), ('i_manufact', 'str'), ('i_size', 'str'),
        ('i_formulation', 'str'), ('i_color', 'str'), ('i_units', 'str'),
        ('i_container', 'str'), ('i_manager_id', 'int'),
        ('i_product_name', 'str'),
    ],
    'store': [
        ('s_store_sk', 'int'), ('s_store_id', 'str'),
        ('s_rec_start_date', 'date'), ('s_rec_end_date', 'date'),
        ('s_closed_date_sk', 'int'), ('s_store_name', 'str'),
        ('s_number_employees', 'int'), ('s_floor_space', 'int'),
        ('s_hours', 'str'), ('s_manager', 'str'), ('s_market_id', 'int'),
        ('s_geography_class', 'str'), ('s_market_desc', 'str'),
        ('s_market_manager', 'str'), ('s_division_id', 'int'),
        ('s_division_name', 'str'), ('s_company_id', 'int'),
        ('s_company_name', 'str'), ('s_street_number', 'str'),
        ('s_street_name', 'str'), ('s_street_type', 'str'),
        ('s_suite_number', 'str'), ('s_city', 'str'), ('s_county', 'str'),
        ('s_state', 'str'), ('s_zip', 'str'), ('s_country', 'str'),
        ('s_gmt_offset', 'dec2'), ('s_tax_precentage', 'dec2'),
    ],
    'call_center': [
        ('cc_call_center_sk', 'int'), ('cc_call_center_id', 'str'),
        ('cc_rec_start_date', 'date'), ('cc_rec_end_date', 'date'),
        ('cc_closed_date_sk', 'int'), ('cc_open_date_sk', 'int'),
        ('cc_name', 'str'), ('cc_class', 'str'), ('cc_employees', 'int'),
        ('cc_sq_ft', 'int'), ('cc_hours', 'str'), ('cc_manager', 'str'),
        ('cc_mkt_id', 'int'), ('cc_mkt_class', 'str'), ('cc_mkt_desc', 'str'),
        ('cc_market_manager', 'str'), ('cc_division', 'int'),
        ('cc_division_name', 'str'), ('cc_company', 'int'),
        ('cc_company_name', 'str'), ('cc_street_number', 'str'),
        ('cc_street_name', 'str'), ('cc_street_type', 'str'),
        ('cc_suite_number', 'str'), ('cc_city', 'str'), ('cc_county', 'str'),
        ('cc_state', 'str'), ('cc_zip', 'str'), ('cc_country', 'str'),
        ('cc_gmt_offset', 'dec2'), ('cc_tax_percentage', 'dec2'),
    ],
    'customer': [
        ('c_customer_sk', 'int'), ('c_customer_id', 'str'),
        ('c_current_cdemo_sk', 'int'), ('c_current_hdemo_sk', 'int'),
        ('c_current_addr_sk', 'int'), ('c_first_shipto_date_sk', 'int'),
        ('c_first_sales_date_sk', 'int'), ('c_salutation', 'str'),
        ('c_first_name', 'str'), ('c_last_name', 'str'),
        ('c_preferred_cust_flag', 'str'), ('c_birth_day', 'int'),
        ('c_birth_month', 'int'), ('c_birth_year', 'int'),
        ('c_birth_country', 'str'), ('c_login', 'str'),
        ('c_email_address', 'str'), ('c_last_review_date', 'int'),
    ],
    'web_site': [
        ('web_site_sk', 'int'), ('web_site_id', 'str'),
        ('web_rec_start_date', 'date'), ('web_rec_end_date', 'date'),
        ('web_name', 'str'), ('web_open_date_sk', 'int'),
        ('web_close_date_sk', 'int'), ('web_class', 'str'),
        ('web_manager', 'str'), ('web_mkt_id', 'int'),
        ('web_mkt_class', 'str'), ('web_mkt_desc', 'str'),
        ('web_market_manager', 'str'), ('web_company_id', 'int'),
        ('web_company_name', 'str'), ('web_street_number', 'str'),
        ('web_street_name', 'str'), ('web_street_type', 'str'),
        ('web_suite_number', 'str'), ('web_city', 'str'),
        ('web_county', 'str'), ('web_state', 'str'), ('web_zip', 'str'),
        ('web_country', 'str'), ('web_gmt_offset', 'dec2'),
        ('web_tax_percentage', 'dec2'),
    ],
    'store_returns': [
        ('sr_returned_date_sk', 'int'), ('sr_return_time_sk', 'int'),
        ('sr_item_sk', 'int'), ('sr_customer_sk', 'int'),
        ('sr_cdemo_sk', 'int'), ('sr_hdemo_sk', 'int'), ('sr_addr_sk', 'int'),
        ('sr_store_sk', 'int'), ('sr_reason_sk', 'int'),
        ('sr_ticket_number', 'int'), ('sr_return_quantity', 'int'),
        ('sr_return_amt', 'dec2'), ('sr_return_tax', 'dec2'),
        ('sr_return_amt_inc_tax', 'dec2'), ('sr_fee', 'dec2'),
        ('sr_return_ship_cost', 'dec2'), ('sr_refunded_cash', 'dec2'),
        ('sr_reversed_charge', 'dec2'), ('sr_store_credit', 'dec2'),
        ('sr_net_loss', 'dec2'),
    ],
    'household_demographics': [
        ('hd_demo_sk', 'int'), ('hd_income_band_sk', 'int'),
        ('hd_buy_potential', 'str'), ('hd_dep_count', 'int'),
        ('hd_vehicle_count', 'int'),
    ],
    'web_page': [
        ('wp_web_page_sk', 'int'), ('wp_web_page_id', 'str'),
        ('wp_rec_start_date', 'date'), ('wp_rec_end_date', 'date'),
        ('wp_creation_date_sk', 'int'), ('wp_access_date_sk', 'int'),
        ('wp_autogen_flag', 'str'), ('wp_customer_sk', 'int'),
        ('wp_url', 'str'), ('wp_type', 'str'), ('wp_char_count', 'int'),
        ('wp_link_count', 'int'), ('wp_image_count', 'int'),
        ('wp_max_ad_count', 'int'),
    ],
    'promotion': [
        ('p_promo_sk', 'int'), ('p_promo_id', 'str'),
        ('p_start_date_sk', 'int'), ('p_end_date_sk', 'int'),
        ('p_item_sk', 'int'), ('p_cost', 'dec2'),
        ('p_response_target', 'int'), ('p_promo_name', 'str'),
        ('p_channel_dmail', 'str'), ('p_channel_email', 'str'),
        ('p_channel_catalog', 'str'), ('p_channel_tv', 'str'),
        ('p_channel_radio', 'str'), ('p_channel_press', 'str'),
        ('p_channel_event', 'str'), ('p_channel_demo', 'str'),
        ('p_channel_details', 'str'), ('p_purpose', 'str'),
        ('p_discount_active', 'str'),
    ],
    'catalog_page': [
        ('cp_catalog_page_sk', 'int'), ('cp_catalog_page_id', 'str'),
        ('cp_start_date_sk', 'int'), ('cp_end_date_sk', 'int'),
        ('cp_department', 'str'), ('cp_catalog_number', 'int'),
        ('cp_catalog_page_number', 'int'), ('cp_description', 'str'),
        ('cp_type', 'str'),
    ],
    'inventory': [
        ('inv_date_sk', 'int'), ('inv_item_sk', 'int'),
        ('inv_warehouse_sk', 'int'), ('inv_quantity_on_hand', 'int'),
    ],
    'catalog_returns': [
        ('cr_returned_date_sk', 'int'), ('cr_returned_time_sk', 'int'),
        ('cr_item_sk', 'int'), ('cr_refunded_customer_sk', 'int'),
        ('cr_refunded_cdemo_sk', 'int'), ('cr_refunded_hdemo_sk', 'int'),
        ('cr_refunded_addr_sk', 'int'), ('cr_returning_customer_sk', 'int'),
        ('cr_returning_cdemo_sk', 'int'), ('cr_returning_hdemo_sk', 'int'),
        ('cr_returning_addr_sk', 'int'), ('cr_call_center_sk', 'int'),
        ('cr_catalog_page_sk', 'int'), ('cr_ship_mode_sk', 'int'),
        ('cr_warehouse_sk', 'int'), ('cr_reason_sk', 'int'),
        ('cr_order_number', 'int'), ('cr_return_quantity', 'int'),
        ('cr_return_amount', 'dec2'), ('cr_return_tax', 'dec2'),
        ('cr_return_amt_inc_tax', 'dec2'), ('cr_fee', 'dec2'),
        ('cr_return_ship_cost', 'dec2'), ('cr_refunded_cash', 'dec2'),
        ('cr_reversed_charge', 'dec2'), ('cr_store_credit', 'dec2'),
        ('cr_net_loss', 'dec2'),
    ],
    'web_returns': [
        ('wr_returned_date_sk', 'int'), ('wr_returned_time_sk', 'int'),
        ('wr_item_sk', 'int'), ('wr_refunded_customer_sk', 'int'),
        ('wr_refunded_cdemo_sk', 'int'), ('wr_refunded_hdemo_sk', 'int'),
        ('wr_refunded_addr_sk', 'int'), ('wr_returning_customer_sk', 'int'),
        ('wr_returning_cdemo_sk', 'int'), ('wr_returning_hdemo_sk', 'int'),
        ('wr_returning_addr_sk', 'int'), ('wr_web_page_sk', 'int'),
        ('wr_reason_sk', 'int'), ('wr_order_number', 'int'),
        ('wr_return_quantity', 'int'), ('wr_return_amt', 'dec2'),
        ('wr_return_tax', 'dec2'), ('wr_return_amt_inc_tax', 'dec2'),
        ('wr_fee', 'dec2'), ('wr_return_ship_cost', 'dec2'),
        ('wr_refunded_cash', 'dec2'), ('wr_reversed_charge', 'dec2'),
        ('wr_account_credit', 'dec2'), ('wr_net_loss', 'dec2'),
    ],
    'web_sales': [
        ('ws_sold_date_sk', 'int'), ('ws_sold_time_sk', 'int'),
        ('ws_ship_date_sk', 'int'), ('ws_item_sk', 'int'),
        ('ws_bill_customer_sk', 'int'), ('ws_bill_cdemo_sk', 'int'),
        ('ws_bill_hdemo_sk', 'int'), ('ws_bill_addr_sk', 'int'),
        ('ws_ship_customer_sk', 'int'), ('ws_ship_cdemo_sk', 'int'),
        ('ws_ship_hdemo_sk', 'int'), ('ws_ship_addr_sk', 'int'),
        ('ws_web_page_sk', 'int'), ('ws_web_site_sk', 'int'),
        ('ws_ship_mode_sk', 'int'), ('ws_warehouse_sk', 'int'),
        ('ws_promo_sk', 'int'), ('ws_order_number', 'int'),
        ('ws_quantity', 'int'), ('ws_wholesale_cost', 'dec2'),
        ('ws_list_price', 'dec2'), ('ws_sales_price', 'dec2'),
        ('ws_ext_discount_amt', 'dec2'), ('ws_ext_sales_price', 'dec2'),
        ('ws_ext_wholesale_cost', 'dec2'), ('ws_ext_list_price', 'dec2'),
        ('ws_ext_tax', 'dec2'), ('ws_coupon_amt', 'dec2'),
        ('ws_ext_ship_cost', 'dec2'), ('ws_net_paid', 'dec2'),
        ('ws_net_paid_inc_tax', 'dec2'), ('ws_net_paid_inc_ship', 'dec2'),
        ('ws_net_paid_inc_ship_tax', 'dec2'), ('ws_net_profit', 'dec2'),
    ],
    'catalog_sales': [
        ('cs_sold_date_sk', 'int'), ('cs_sold_time_sk', 'int'),
        ('cs_ship_date_sk', 'int'), ('cs_bill_customer_sk', 'int'),
        ('cs_bill_cdemo_sk', 'int'), ('cs_bill_hdemo_sk', 'int'),
        ('cs_bill_addr_sk', 'int'), ('cs_ship_customer_sk', 'int'),
        ('cs_ship_cdemo_sk', 'int'), ('cs_ship_hdemo_sk', 'int'),
        ('cs_ship_addr_sk', 'int'), ('cs_call_center_sk', 'int'),
        ('cs_catalog_page_sk', 'int'), ('cs_ship_mode_sk', 'int'),
        ('cs_warehouse_sk', 'int'), ('cs_item_sk', 'int'),
        ('cs_promo_sk', 'int'), ('cs_order_number', 'int'),
        ('cs_quantity', 'int'), ('cs_wholesale_cost', 'dec2'),
        ('cs_list_price', 'dec2'), ('cs_sales_price', 'dec2'),
        ('cs_ext_discount_amt', 'dec2'), ('cs_ext_sales_price', 'dec2'),
        ('cs_ext_wholesale_cost', 'dec2'), ('cs_ext_list_price', 'dec2'),
        ('cs_ext_tax', 'dec2'), ('cs_coupon_amt', 'dec2'),
        ('cs_ext_ship_cost', 'dec2'), ('cs_net_paid', 'dec2'),
        ('cs_net_paid_inc_tax', 'dec2'), ('cs_net_paid_inc_ship', 'dec2'),
        ('cs_net_paid_inc_ship_tax', 'dec2'), ('cs_net_profit', 'dec2'),
    ],
    'store_sales': [
        ('ss_sold_date_sk', 'int'), ('ss_sold_time_sk', 'int'),
        ('ss_item_sk', 'int'), ('ss_customer_sk', 'int'),
        ('ss_cdemo_sk', 'int'), ('ss_hdemo_sk', 'int'), ('ss_addr_sk', 'int'),
        ('ss_store_sk', 'int'), ('ss_promo_sk', 'int'),
        ('ss_ticket_number', 'int'), ('ss_quantity', 'int'),
        ('ss_wholesale_cost', 'dec2'), ('ss_list_price', 'dec2'),
        ('ss_sales_price', 'dec2'), ('ss_ext_discount_amt', 'dec2'),
        ('ss_ext_sales_price', 'dec2'), ('ss_ext_wholesale_cost', 'dec2'),
        ('ss_ext_list_price', 'dec2'), ('ss_ext_tax', 'dec2'),
        ('ss_coupon_amt', 'dec2'), ('ss_net_paid', 'dec2'),
        ('ss_net_paid_inc_tax', 'dec2'), ('ss_net_profit', 'dec2'),
    ],
}

# --------------------------------------------------------------------------
# value domains (every literal the 99 queries test against must be reachable)
# --------------------------------------------------------------------------

CATEGORIES = ["Books", "Children", "Electronics", "Home", "Jewelry", "Men",
              "Music", "Shoes", "Sports", "Women"]
CLASSES = {
    "Books": ["computers", "travel", "science", "self-help", "reference",
              "fiction", "history", "romance"],
    "Children": ["toddlers", "infants", "school-uniforms", "newborn"],
    "Electronics": ["stereo", "televisions", "cameras", "personal",
                    "portable", "audio", "karoke", "dvd/vcr players"],
    "Home": ["bathroom", "bedding", "curtains/drapes", "decor", "flatware",
             "furniture", "glassware", "kids", "lighting", "mattresses",
             "paint", "rugs", "tables", "wallpaper", "accent"],
    "Jewelry": ["birdal", "costume", "diamonds", "estate", "gold",
                "jewelry boxes", "loose stones", "mens watch", "pendants",
                "rings", "semi-precious", "womens watch", "consignment"],
    "Men": ["accessories", "pants", "shirts", "sports-apparel"],
    "Music": ["classical", "pop", "rock", "country"],
    "Shoes": ["athletic", "kids", "mens", "womens"],
    "Sports": ["athletic-shoes", "baseball", "basketball", "camping",
               "fishing", "football", "golf", "hockey", "optics", "outdoor",
               "pools", "sailing", "tennis", "archery", "guns"],
    "Women": ["dresses", "fragrances", "maternity", "swimwear"],
}
COLORS = ["almond", "antique", "aquamarine", "azure", "beige", "bisque",
          "black", "blanched", "blue", "blush", "brown", "burlywood",
          "burnished", "chartreuse", "chiffon", "chocolate", "coral",
          "cornflower", "cornsilk", "cream", "cyan", "dark", "deep", "dim",
          "dodger", "drab", "firebrick", "floral", "forest", "frosted",
          "gainsboro", "ghost", "goldenrod", "green", "grey", "honeydew",
          "hot", "indian", "ivory", "khaki", "lace", "lavender", "lawn",
          "lemon", "light", "lime", "linen", "magenta", "maroon", "medium",
          "metallic", "midnight", "mint", "misty", "moccasin", "navajo",
          "navy", "olive", "orange", "orchid", "pale", "papaya", "peach",
          "peru", "pink", "plum", "powder", "puff", "purple", "red", "rose",
          "rosy", "royal", "saddle", "salmon", "sandy", "seashell", "sienna",
          "sky", "slate", "smoke", "snow", "spring", "steel", "tan",
          "thistle", "tomato", "turquoise", "violet", "wheat", "white",
          "yellow"]
SIZES = ["N/A", "economy", "extra large", "large", "medium", "petite",
         "small"]
UNITS = ["Box", "Bunch", "Bundle", "Carton", "Case", "Cup", "Dozen", "Dram",
         "Each", "Gram", "Gross", "Lb", "N/A", "Ounce", "Oz", "Pallet",
         "Pound", "Tbl", "Ton", "Tsp", "Unknown"]
STATES = ["AL", "AR", "CA", "CO", "CT", "FL", "GA", "IA", "IL", "IN", "KS",
          "KY", "LA", "MI", "MN", "MO", "MS", "MT", "NC", "ND", "NE", "NJ",
          "NM", "NY", "OH", "OK", "OR", "PA", "SC", "SD", "TN", "TX", "UT",
          "VA", "WA", "WI", "WV"]
COUNTIES = ["Williamson County", "Franklin Parish", "Bronx County",
            "Orange County", "Toole County", "Rush County",
            "La Porte County", "Jefferson County", "Dona Ana County",
            "Ziebach County", "Walker County", "Richland County",
            "Gaines County", "Fairfield County", "Barrow County",
            "Mobile County", "Maverick County", "Huron County",
            "Kittitas County", "Mesa County"]
CITIES = ["Fairview", "Midway", "Edgewood", "Oak Grove", "Five Points",
          "Pleasant Hill", "Centerville", "Riverside", "Bethel",
          "Lakeview", "Union", "Salem", "Georgetown", "Greenfield",
          "Springdale"]
EDUCATION = ["Primary", "Secondary", "College", "2 yr Degree", "4 yr Degree",
             "Advanced Degree", "Unknown"]
MARITAL = ["M", "S", "D", "W", "U"]
CREDIT = ["Good", "High Risk", "Low Risk", "Unknown"]
BUY_POTENTIAL = [">10000", "5001-10000", "1001-5000", "501-1000", "0-500",
                 "Unknown"]
DAY_NAMES = ["Sunday", "Monday", "Tuesday", "Wednesday", "Thursday",
             "Friday", "Saturday"]
SM_TYPES = ["EXPRESS", "NEXT DAY", "OVERNIGHT", "REGULAR", "TWO DAY"]
SM_CARRIERS = ["DHL", "BARIAN", "UPS", "FEDEX", "AIRBORNE", "USPS", "ZHOU",
               "LATVIAN"]
COUNTRIES = ["United States", "Canada", "Mexico", "Germany", "France",
             "Japan", "Brazil", "India", "China", "Australia"]
FIRST_NAMES = ["James", "Mary", "John", "Linda", "Robert", "Susan",
               "Michael", "Karen", "William", "Lisa", "David", "Nancy",
               "Anna", "Paul", "Laura", "Kevin", "Sarah", "Brian", "Julie",
               "Mark"]
LAST_NAMES = ["Smith", "Johnson", "Williams", "Brown", "Jones", "Miller",
              "Davis", "Garcia", "Wilson", "Moore", "Taylor", "Anderson",
              "Thomas", "Jackson", "White", "Harris", "Martin", "Thompson",
              "Young", "King"]
STORE_NAMES = ["ought", "able", "pri", "ese", "anti", "cally", "ation",
               "eing", "bar", "bir"]
STREET_TYPES = ["Ave", "Blvd", "Cir", "Ct", "Dr", "Ln", "Pkwy", "Rd", "St",
                "Way"]
STREET_NAMES = ["Main", "Oak", "Park", "Elm", "Lake", "Hill", "Maple",
                "Pine", "Cedar", "Walnut", "Center", "River", "Spring",
                "Sunset", "Railroad"]

_EPOCH_JULIAN = 2440588  # julian day number of 1970-01-01

DATE_LO = np.datetime64("1990-01-01")
DATE_HI = np.datetime64("2003-12-31")
SALES_LO = np.datetime64("1998-01-01")
SALES_HI = np.datetime64("2002-12-31")


def _days(d64):
    return int((d64 - np.datetime64("1970-01-01")).astype(int))


def _rr(pool, n, stride=1, offset=0):
    """Round-robin selection from a pool (object array for strings)."""
    pool = np.asarray(pool, dtype=object)
    return pool[(offset + np.arange(n) * stride) % len(pool)]


def _ids(prefix, n):
    return np.array([f"{prefix}{i:012d}" for i in range(1, n + 1)],
                    dtype=object)


def generate(sf: float = 0.01, seed: int = 20030101) -> dict:
    """Generate all 24 tables at scale `sf` (sf=1 ~= 300k store_sales rows)."""
    rng = np.random.default_rng(seed)
    raw: dict[str, dict[str, np.ndarray]] = {}

    # ---- date_dim ---------------------------------------------------------
    days = np.arange(DATE_LO, DATE_HI + np.timedelta64(1, "D"),
                     dtype="datetime64[D]")
    n = len(days)
    epoch_days = days.astype("datetime64[D]").astype(int)
    sk = epoch_days + _EPOCH_JULIAN
    years = days.astype("datetime64[Y]").astype(int) + 1970
    months0 = days.astype("datetime64[M]").astype(int)          # since 1970-01
    moy = months0 % 12 + 1
    dom = (days - days.astype("datetime64[M]")).astype(int) + 1
    dow = (epoch_days + 4) % 7                                   # 0 = Sunday
    month_seq = months0 + (1970 - 1900) * 12
    week_seq = (epoch_days + 4) // 7 + (70 * 365) // 7           # consistent
    qoy = (moy - 1) // 3 + 1
    quarter_seq = (years - 1900) * 4 + qoy - 1
    first_dom_sk = days.astype("datetime64[M]").astype("datetime64[D]"
                                                       ).astype(int) + _EPOCH_JULIAN
    last_dom_sk = ((days.astype("datetime64[M]") + 1).astype("datetime64[D]")
                   .astype(int) - 1 + _EPOCH_JULIAN)
    raw["date_dim"] = {
        "d_date_sk": sk.astype(np.int64),
        "d_date_id": np.array([f"D{int(s)}" for s in sk], dtype=object),
        "d_date": epoch_days.astype(np.int32),
        "d_month_seq": month_seq.astype(np.int64),
        "d_week_seq": week_seq.astype(np.int64),
        "d_quarter_seq": quarter_seq.astype(np.int64),
        "d_year": years.astype(np.int64),
        "d_dow": dow.astype(np.int64),
        "d_moy": moy.astype(np.int64),
        "d_dom": dom.astype(np.int64),
        "d_qoy": qoy.astype(np.int64),
        "d_fy_year": years.astype(np.int64),
        "d_fy_quarter_seq": quarter_seq.astype(np.int64),
        "d_fy_week_seq": week_seq.astype(np.int64),
        "d_day_name": np.asarray(DAY_NAMES, dtype=object)[dow],
        "d_quarter_name": np.array(
            [f"{y}Q{q}" for y, q in zip(years, qoy)], dtype=object),
        "d_holiday": np.where((moy == 12) & (dom == 25), "Y", "N").astype(object),
        "d_weekend": np.where((dow == 0) | (dow == 6), "Y", "N").astype(object),
        "d_following_holiday": np.where((moy == 12) & (dom == 26), "Y",
                                        "N").astype(object),
        "d_first_dom": first_dom_sk.astype(np.int64),
        "d_last_dom": last_dom_sk.astype(np.int64),
        "d_same_day_ly": (sk - 365).astype(np.int64),
        "d_same_day_lq": (sk - 91).astype(np.int64),
        "d_current_day": np.full(n, "N", dtype=object),
        "d_current_week": np.full(n, "N", dtype=object),
        "d_current_month": np.full(n, "N", dtype=object),
        "d_current_quarter": np.full(n, "N", dtype=object),
        "d_current_year": np.full(n, "N", dtype=object),
    }

    # ---- time_dim ---------------------------------------------------------
    tsk = np.arange(0, 86400, 30, dtype=np.int64)               # 2880 rows
    hour = tsk // 3600
    minute = (tsk % 3600) // 60
    meal = np.full(len(tsk), "", dtype=object)
    meal[(hour >= 6) & (hour < 9)] = "breakfast"
    meal[(hour >= 11) & (hour < 14)] = "lunch"
    meal[(hour >= 17) & (hour < 21)] = "dinner"
    raw["time_dim"] = {
        "t_time_sk": tsk,
        "t_time_id": np.array([f"T{t:08d}" for t in tsk], dtype=object),
        "t_time": tsk.copy(),
        "t_hour": hour,
        "t_minute": minute,
        "t_second": tsk % 60,
        "t_am_pm": np.where(hour < 12, "AM", "PM").astype(object),
        "t_shift": np.asarray(["third", "first", "second"], dtype=object)[
            np.clip(hour // 8, 0, 2)],
        "t_sub_shift": np.asarray(
            ["night", "morning", "afternoon", "evening"], dtype=object)[
            np.clip(hour // 6, 0, 3)],
        "t_meal_time": meal,
    }

    # ---- small dimensions --------------------------------------------------
    def _addr_block(prefix, n, rng):
        return {
            f"{prefix}street_number": np.array(
                [str(100 + i * 7 % 900) for i in range(n)], dtype=object),
            f"{prefix}street_name": _rr(STREET_NAMES, n, 3),
            f"{prefix}street_type": _rr(STREET_TYPES, n, 1),
            f"{prefix}suite_number": np.array(
                [f"Suite {i % 300}" for i in range(n)], dtype=object),
            f"{prefix}city": _rr(CITIES, n, 1),
            f"{prefix}county": _rr(COUNTIES, n, 1),
            f"{prefix}state": _rr(STATES, n, 1),
            f"{prefix}zip": np.array(
                [f"{10000 + (i * 131) % 89999:05d}" for i in range(n)],
                dtype=object),
            f"{prefix}country": np.full(n, "United States", dtype=object),
            f"{prefix}gmt_offset": -(500 + 100 * (np.arange(n) % 6)).astype(
                np.int64),
        }

    n_ca = max(200, int(2000 * sf))
    ca = {
        "ca_address_sk": np.arange(1, n_ca + 1, dtype=np.int64),
        "ca_address_id": _ids("ADDR", n_ca),
        "ca_location_type": _rr(["apartment", "condo", "single family"],
                                n_ca, 1),
    }
    ca.update(_addr_block("ca_", n_ca, rng))
    raw["customer_address"] = ca

    # full categorical cross product (the spec's 1.92M-row table collapsed
    # to its satisfiability core: every predicate combination exists)
    combos = [(g, m, e, c, pe, dc)
              for g in ["M", "F"] for m in MARITAL for e in EDUCATION
              for c in CREDIT for pe in (500, 1000, 2500, 5000, 7500, 10000)
              for dc in (0, 1, 3)]
    n_cd = len(combos)
    raw["customer_demographics"] = {
        "cd_demo_sk": np.arange(1, n_cd + 1, dtype=np.int64),
        "cd_gender": np.array([c[0] for c in combos], dtype=object),
        "cd_marital_status": np.array([c[1] for c in combos], dtype=object),
        "cd_education_status": np.array([c[2] for c in combos], dtype=object),
        "cd_purchase_estimate": np.array([c[4] for c in combos], np.int64),
        "cd_credit_rating": np.array([c[3] for c in combos], dtype=object),
        "cd_dep_count": np.array([c[5] for c in combos], np.int64),
        "cd_dep_employed_count": np.array([c[5] for c in combos], np.int64),
        "cd_dep_college_count": np.array(
            [c[5] % 2 for c in combos], np.int64),
    }

    hd = [(ib, bp, dc, vc)
          for ib in range(1, 21) for bp in BUY_POTENTIAL
          for dc in range(0, 10, 3) for vc in range(-1, 5, 2)]
    n_hd = len(hd)
    raw["household_demographics"] = {
        "hd_demo_sk": np.arange(1, n_hd + 1, dtype=np.int64),
        "hd_income_band_sk": np.array([h[0] for h in hd], np.int64),
        "hd_buy_potential": np.array([h[1] for h in hd], dtype=object),
        "hd_dep_count": np.array([h[2] for h in hd], np.int64),
        "hd_vehicle_count": np.array([h[3] for h in hd], np.int64),
    }

    raw["income_band"] = {
        "ib_income_band_sk": np.arange(1, 21, dtype=np.int64),
        "ib_lower_bound": (np.arange(20, dtype=np.int64)) * 10000 + \
            np.where(np.arange(20) > 0, 1, 0),
        "ib_upper_bound": (np.arange(1, 21, dtype=np.int64)) * 10000,
    }

    n_reason = 55
    raw["reason"] = {
        "r_reason_sk": np.arange(1, n_reason + 1, dtype=np.int64),
        "r_reason_id": _ids("RSN", n_reason),
        "r_reason_desc": np.array(
            [f"reason {i}" for i in range(1, n_reason + 1)], dtype=object),
    }

    raw["ship_mode"] = {
        "sm_ship_mode_sk": np.arange(1, 21, dtype=np.int64),
        "sm_ship_mode_id": _ids("SM", 20),
        "sm_type": _rr(SM_TYPES, 20, 1),
        "sm_code": _rr(["AIR", "SURFACE", "SEA"], 20, 1),
        "sm_carrier": _rr(SM_CARRIERS, 20, 1),
        "sm_contract": _ids("CT", 20),
    }

    # ---- item --------------------------------------------------------------
    n_item = max(len(CATEGORIES) * 20, int(1000 * sf))
    cat_idx = np.arange(n_item) % len(CATEGORIES)
    cats = np.asarray(CATEGORIES, dtype=object)[cat_idx]
    classes = np.empty(n_item, dtype=object)
    class_id = np.zeros(n_item, dtype=np.int64)
    for ci, cat in enumerate(CATEGORIES):
        rows = np.where(cat_idx == ci)[0]
        pool = CLASSES[cat]
        sel = (rows // len(CATEGORIES)) % len(pool)
        classes[rows] = np.asarray(pool, dtype=object)[sel]
        class_id[rows] = sel + 1
    brand_id = (cat_idx + 1) * 1000000 + (np.arange(n_item) % 50) * 1000 + \
        np.arange(n_item) % 10
    manufact_id = np.arange(n_item) % 1000 + 1
    price_c = ((np.arange(n_item) * 97) % 9900) + 9          # 0.09 .. 99.09
    raw["item"] = {
        "i_item_sk": np.arange(1, n_item + 1, dtype=np.int64),
        "i_item_id": _ids("ITEM", n_item),
        "i_rec_start_date": np.full(n_item, _days(DATE_LO), np.int32),
        "i_rec_end_date": np.full(n_item, _days(DATE_HI), np.int32),
        "i_item_desc": np.array(
            [f"the promise of {COLORS[i % len(COLORS)]} goods {i}"
             for i in range(n_item)], dtype=object),
        "i_current_price": price_c.astype(np.int64),
        "i_wholesale_cost": (price_c * 6 // 10).astype(np.int64),
        "i_brand_id": brand_id.astype(np.int64),
        "i_brand": np.array([f"brand{b // 1000000}#{b % 1000}"
                             for b in brand_id], dtype=object),
        "i_class_id": class_id,
        "i_class": classes,
        "i_category_id": (cat_idx + 1).astype(np.int64),
        "i_category": cats,
        "i_manufact_id": manufact_id.astype(np.int64),
        "i_manufact": np.array([f"manufact{m % 200}" for m in manufact_id],
                               dtype=object),
        "i_size": _rr(SIZES, n_item, 1),
        "i_formulation": _ids("FORM", n_item),
        "i_color": _rr(COLORS, n_item, 1),
        "i_units": _rr(UNITS, n_item, 1),
        "i_container": np.full(n_item, "Unknown", dtype=object),
        "i_manager_id": (np.arange(n_item) % 100 + 1).astype(np.int64),
        "i_product_name": np.array(
            [f"product{i}" for i in range(1, n_item + 1)], dtype=object),
    }

    # ---- customer ----------------------------------------------------------
    n_cust = max(500, int(5000 * sf))
    sales_days = np.arange(SALES_LO, SALES_HI + np.timedelta64(1, "D"),
                           dtype="datetime64[D]").astype(int)
    first_sales = sales_days[np.arange(n_cust) % len(sales_days)] + \
        _EPOCH_JULIAN - 365 * 4
    raw["customer"] = {
        "c_customer_sk": np.arange(1, n_cust + 1, dtype=np.int64),
        "c_customer_id": _ids("CUST", n_cust),
        "c_current_cdemo_sk": (np.arange(n_cust) * 7 % n_cd + 1).astype(np.int64),
        "c_current_hdemo_sk": (np.arange(n_cust) * 11 % n_hd + 1).astype(np.int64),
        "c_current_addr_sk": (np.arange(n_cust) * 13 % n_ca + 1).astype(np.int64),
        "c_first_shipto_date_sk": (first_sales + 30).astype(np.int64),
        "c_first_sales_date_sk": first_sales.astype(np.int64),
        "c_salutation": _rr(["Mr.", "Mrs.", "Ms.", "Dr.", "Miss", "Sir"],
                            n_cust, 1),
        "c_first_name": _rr(FIRST_NAMES, n_cust, 3),
        "c_last_name": _rr(LAST_NAMES, n_cust, 7),
        "c_preferred_cust_flag": _rr(["Y", "N"], n_cust, 1),
        "c_birth_day": (np.arange(n_cust) % 28 + 1).astype(np.int64),
        "c_birth_month": (np.arange(n_cust) % 12 + 1).astype(np.int64),
        "c_birth_year": (1924 + np.arange(n_cust) * 17 % 69).astype(np.int64),
        "c_birth_country": _rr(COUNTRIES, n_cust, 1),
        "c_login": _ids("LOGIN", n_cust),
        "c_email_address": np.array(
            [f"c{i}@example.com" for i in range(1, n_cust + 1)], dtype=object),
        "c_last_review_date": (first_sales + 200).astype(np.int64),
    }

    # ---- store / warehouse / call_center / web_site / web_page /
    #      catalog_page / promotion -----------------------------------------
    n_store = max(6, int(12 * max(sf, 0.5)))
    st = {
        "s_store_sk": np.arange(1, n_store + 1, dtype=np.int64),
        "s_store_id": _ids("STORE", n_store),
        "s_rec_start_date": np.full(n_store, _days(DATE_LO), np.int32),
        "s_rec_end_date": np.full(n_store, _days(DATE_HI), np.int32),
        "s_closed_date_sk": np.zeros(n_store, np.int64),
        "s_store_name": _rr(STORE_NAMES, n_store, 1),
        "s_number_employees": (200 + np.arange(n_store) * 13 % 100).astype(np.int64),
        "s_floor_space": (5000000 + np.arange(n_store) * 77777 % 5000000).astype(np.int64),
        "s_hours": _rr(["8AM-4PM", "8AM-12AM", "8AM-8AM"], n_store, 1),
        "s_manager": _rr(FIRST_NAMES, n_store, 5),
        "s_market_id": (np.arange(n_store) % 10 + 1).astype(np.int64),
        "s_geography_class": np.full(n_store, "Unknown", dtype=object),
        "s_market_desc": np.full(n_store, "market", dtype=object),
        "s_market_manager": _rr(LAST_NAMES, n_store, 3),
        "s_division_id": np.ones(n_store, np.int64),
        "s_division_name": np.full(n_store, "Unknown", dtype=object),
        "s_company_id": np.ones(n_store, np.int64),
        "s_company_name": np.full(n_store, "Unknown", dtype=object),
        "s_tax_precentage": (np.arange(n_store) % 12).astype(np.int64),
    }
    st.update(_addr_block("s_", n_store, rng))
    st["s_state"] = _rr(["TN"] * 3 + STATES, n_store, 1)   # TN-heavy (q1 etc.)
    raw["store"] = st

    n_wh = max(5, int(5 * max(sf, 1)))
    wh = {
        "w_warehouse_sk": np.arange(1, n_wh + 1, dtype=np.int64),
        "w_warehouse_id": _ids("WH", n_wh),
        "w_warehouse_name": np.array(
            [f"Warehouse {i}" for i in range(1, n_wh + 1)], dtype=object),
        "w_warehouse_sq_ft": (100000 + np.arange(n_wh) * 50021 % 900000
                              ).astype(np.int64),
    }
    wh.update(_addr_block("w_", n_wh, rng))
    raw["warehouse"] = wh

    n_cc = max(4, int(6 * max(sf, 0.5)))
    cc = {
        "cc_call_center_sk": np.arange(1, n_cc + 1, dtype=np.int64),
        "cc_call_center_id": _ids("CC", n_cc),
        "cc_rec_start_date": np.full(n_cc, _days(DATE_LO), np.int32),
        "cc_rec_end_date": np.full(n_cc, _days(DATE_HI), np.int32),
        "cc_closed_date_sk": np.zeros(n_cc, np.int64),
        "cc_open_date_sk": np.full(n_cc, int(sales_days[0]) + _EPOCH_JULIAN
                                   - 1000, np.int64),
        "cc_name": np.array([f"call center {i}" for i in range(1, n_cc + 1)],
                            dtype=object),
        "cc_class": _rr(["small", "medium", "large"], n_cc, 1),
        "cc_employees": (50 + np.arange(n_cc) * 31 % 500).astype(np.int64),
        "cc_sq_ft": (10000 + np.arange(n_cc) * 997 % 90000).astype(np.int64),
        "cc_hours": _rr(["8AM-4PM", "8AM-12AM", "8AM-8AM"], n_cc, 1),
        "cc_manager": _rr(FIRST_NAMES, n_cc, 7),
        "cc_mkt_id": (np.arange(n_cc) % 6 + 1).astype(np.int64),
        "cc_mkt_class": np.full(n_cc, "Unknown", dtype=object),
        "cc_mkt_desc": np.full(n_cc, "mkt", dtype=object),
        "cc_market_manager": _rr(LAST_NAMES, n_cc, 5),
        "cc_division": np.ones(n_cc, np.int64),
        "cc_division_name": np.full(n_cc, "Unknown", dtype=object),
        "cc_company": np.ones(n_cc, np.int64),
        "cc_company_name": np.full(n_cc, "Unknown", dtype=object),
        "cc_tax_percentage": (np.arange(n_cc) % 12).astype(np.int64),
    }
    cc.update(_addr_block("cc_", n_cc, rng))
    raw["call_center"] = cc

    n_web = max(4, int(6 * max(sf, 0.5)))
    ws_site = {
        "web_site_sk": np.arange(1, n_web + 1, dtype=np.int64),
        "web_site_id": _ids("WEB", n_web),
        "web_rec_start_date": np.full(n_web, _days(DATE_LO), np.int32),
        "web_rec_end_date": np.full(n_web, _days(DATE_HI), np.int32),
        "web_name": np.array([f"site_{i}" for i in range(n_web)], dtype=object),
        "web_open_date_sk": np.full(n_web, int(sales_days[0]) + _EPOCH_JULIAN
                                    - 500, np.int64),
        "web_close_date_sk": np.zeros(n_web, np.int64),
        "web_class": np.full(n_web, "Unknown", dtype=object),
        "web_manager": _rr(FIRST_NAMES, n_web, 11),
        "web_mkt_id": (np.arange(n_web) % 6 + 1).astype(np.int64),
        "web_mkt_class": np.full(n_web, "Unknown", dtype=object),
        "web_mkt_desc": np.full(n_web, "mkt", dtype=object),
        "web_market_manager": _rr(LAST_NAMES, n_web, 9),
        "web_company_id": (np.arange(n_web) % 6 + 1).astype(np.int64),
        "web_company_name": _rr(STORE_NAMES, n_web, 1),
        "web_tax_percentage": (np.arange(n_web) % 12).astype(np.int64),
    }
    ws_site.update(_addr_block("web_", n_web, rng))
    raw["web_site"] = ws_site

    n_wp = max(10, int(20 * max(sf, 0.5)))
    raw["web_page"] = {
        "wp_web_page_sk": np.arange(1, n_wp + 1, dtype=np.int64),
        "wp_web_page_id": _ids("WP", n_wp),
        "wp_rec_start_date": np.full(n_wp, _days(DATE_LO), np.int32),
        "wp_rec_end_date": np.full(n_wp, _days(DATE_HI), np.int32),
        "wp_creation_date_sk": np.full(n_wp, int(sales_days[0])
                                       + _EPOCH_JULIAN - 100, np.int64),
        "wp_access_date_sk": np.full(n_wp, int(sales_days[0])
                                     + _EPOCH_JULIAN, np.int64),
        "wp_autogen_flag": _rr(["Y", "N"], n_wp, 1),
        "wp_customer_sk": (np.arange(n_wp) % n_cust + 1).astype(np.int64),
        "wp_url": np.full(n_wp, "http://www.example.com", dtype=object),
        "wp_type": _rr(["ad", "dynamic", "feedback", "general", "order",
                        "protected", "welcome"], n_wp, 1),
        "wp_char_count": (1000 + np.arange(n_wp) * 301 % 5000).astype(np.int64),
        "wp_link_count": (np.arange(n_wp) % 20 + 2).astype(np.int64),
        "wp_image_count": (np.arange(n_wp) % 7 + 1).astype(np.int64),
        "wp_max_ad_count": (np.arange(n_wp) % 4).astype(np.int64),
    }

    n_cp = max(20, int(40 * max(sf, 0.5)))
    raw["catalog_page"] = {
        "cp_catalog_page_sk": np.arange(1, n_cp + 1, dtype=np.int64),
        "cp_catalog_page_id": _ids("CP", n_cp),
        "cp_start_date_sk": np.full(n_cp, int(sales_days[0]) + _EPOCH_JULIAN,
                                    np.int64),
        "cp_end_date_sk": np.full(n_cp, int(sales_days[-1]) + _EPOCH_JULIAN,
                                  np.int64),
        "cp_department": np.full(n_cp, "DEPARTMENT", dtype=object),
        "cp_catalog_number": (np.arange(n_cp) % 5 + 1).astype(np.int64),
        "cp_catalog_page_number": (np.arange(n_cp) + 1).astype(np.int64),
        "cp_description": np.array([f"page {i}" for i in range(n_cp)],
                                   dtype=object),
        "cp_type": _rr(["bi-annual", "monthly", "quarterly"], n_cp, 1),
    }

    n_promo = max(10, int(30 * max(sf, 0.5)))
    raw["promotion"] = {
        "p_promo_sk": np.arange(1, n_promo + 1, dtype=np.int64),
        "p_promo_id": _ids("PROMO", n_promo),
        "p_start_date_sk": np.full(n_promo, int(sales_days[0])
                                   + _EPOCH_JULIAN, np.int64),
        "p_end_date_sk": np.full(n_promo, int(sales_days[-1])
                                 + _EPOCH_JULIAN, np.int64),
        "p_item_sk": (np.arange(n_promo) % n_item + 1).astype(np.int64),
        "p_cost": np.full(n_promo, 100000, np.int64),
        "p_response_target": np.ones(n_promo, np.int64),
        "p_promo_name": _rr(STORE_NAMES, n_promo, 1),
        "p_channel_dmail": _rr(["Y", "N"], n_promo, 1),
        "p_channel_email": _rr(["N", "Y"], n_promo, 1),
        "p_channel_catalog": _rr(["N", "N", "Y"], n_promo, 1),
        "p_channel_tv": _rr(["N", "Y", "N"], n_promo, 1),
        "p_channel_radio": _rr(["N", "N", "N", "Y"], n_promo, 1),
        "p_channel_press": _rr(["N", "Y", "N", "N"], n_promo, 1),
        "p_channel_event": _rr(["Y", "N", "N"], n_promo, 1),
        "p_channel_demo": _rr(["N", "N", "Y", "N"], n_promo, 1),
        "p_channel_details": np.array([f"promo details {i}"
                                       for i in range(n_promo)], dtype=object),
        "p_purpose": np.full(n_promo, "Unknown", dtype=object),
        "p_discount_active": _rr(["N", "Y"], n_promo, 1),
    }

    # ---- fact tables -------------------------------------------------------
    sales_sks = sales_days + _EPOCH_JULIAN

    def _money(n, key):
        """Deterministic money columns (cents) for n line items."""
        qty = (np.arange(n) * 13 % 100 + 1).astype(np.int64)
        whol = ((np.arange(n) * 37 + key) % 9900 + 100).astype(np.int64)
        rate = (np.arange(n) * 7 % 100).astype(np.int64)   # markup %
        lst = whol + whol * rate // 100
        disc = (np.arange(n) * 11 % 100).astype(np.int64)  # discount %
        sale = lst - lst * disc // 100
        coupon = np.where(np.arange(n) % 17 == 0, sale * qty // 10, 0)
        tax_r = (np.arange(n) % 10).astype(np.int64)       # 0..9 %
        ext_sale = sale * qty
        net_paid = ext_sale - coupon
        tax = net_paid * tax_r // 100
        ship_c = whol * qty // 8
        return {
            "quantity": qty, "wholesale_cost": whol, "list_price": lst,
            "sales_price": sale, "ext_discount_amt": (lst - sale) * qty,
            "ext_sales_price": ext_sale, "ext_wholesale_cost": whol * qty,
            "ext_list_price": lst * qty, "ext_tax": tax,
            "coupon_amt": coupon, "ext_ship_cost": ship_c,
            "net_paid": net_paid, "net_paid_inc_tax": net_paid + tax,
            "net_paid_inc_ship": net_paid + ship_c,
            "net_paid_inc_ship_tax": net_paid + ship_c + tax,
            "net_profit": net_paid - whol * qty,
        }

    # store_sales: baskets of ~4 items share a ticket / customer / date
    n_ss = max(2000, int(300000 * sf))
    basket = np.arange(n_ss) // 4
    ss_date = sales_sks[(basket * 211) % len(sales_sks)]
    ss_cust = (basket * 17) % n_cust + 1
    m = _money(n_ss, 3)
    raw["store_sales"] = {
        "ss_sold_date_sk": ss_date.astype(np.int64),
        "ss_sold_time_sk": tsk[(np.arange(n_ss) * 101) % len(tsk)],
        "ss_item_sk": ((np.arange(n_ss) * 31) % n_item + 1).astype(np.int64),
        "ss_customer_sk": ss_cust.astype(np.int64),
        "ss_cdemo_sk": ((basket * 23) % n_cd + 1).astype(np.int64),
        "ss_hdemo_sk": ((basket * 19) % n_hd + 1).astype(np.int64),
        "ss_addr_sk": ((basket * 13) % n_ca + 1).astype(np.int64),
        "ss_store_sk": ((basket * 7) % n_store + 1).astype(np.int64),
        "ss_promo_sk": ((np.arange(n_ss) * 3) % n_promo + 1).astype(np.int64),
        "ss_ticket_number": (basket + 1).astype(np.int64),
        "ss_quantity": m["quantity"],
        "ss_wholesale_cost": m["wholesale_cost"],
        "ss_list_price": m["list_price"],
        "ss_sales_price": m["sales_price"],
        "ss_ext_discount_amt": m["ext_discount_amt"],
        "ss_ext_sales_price": m["ext_sales_price"],
        "ss_ext_wholesale_cost": m["ext_wholesale_cost"],
        "ss_ext_list_price": m["ext_list_price"],
        "ss_ext_tax": m["ext_tax"],
        "ss_coupon_amt": m["coupon_amt"],
        "ss_net_paid": m["net_paid"],
        "ss_net_paid_inc_tax": m["net_paid_inc_tax"],
        "ss_net_profit": m["net_profit"],
    }

    # store_returns: every 9th sale returned, 0..90 days later
    r_idx = np.arange(0, n_ss, 9)
    n_sr = len(r_idx)
    rq = np.minimum(raw["store_sales"]["ss_quantity"][r_idx],
                    (np.arange(n_sr) % 5 + 1))
    ramt = raw["store_sales"]["ss_sales_price"][r_idx] * rq
    rtax = ramt * (np.arange(n_sr) % 10) // 100
    raw["store_returns"] = {
        "sr_returned_date_sk": (raw["store_sales"]["ss_sold_date_sk"][r_idx]
                                + (r_idx * 7) % 90 + 1).astype(np.int64),
        "sr_return_time_sk": tsk[(r_idx * 3) % len(tsk)],
        "sr_item_sk": raw["store_sales"]["ss_item_sk"][r_idx],
        "sr_customer_sk": raw["store_sales"]["ss_customer_sk"][r_idx],
        "sr_cdemo_sk": raw["store_sales"]["ss_cdemo_sk"][r_idx],
        "sr_hdemo_sk": raw["store_sales"]["ss_hdemo_sk"][r_idx],
        "sr_addr_sk": raw["store_sales"]["ss_addr_sk"][r_idx],
        "sr_store_sk": raw["store_sales"]["ss_store_sk"][r_idx],
        "sr_reason_sk": ((r_idx * 5) % n_reason + 1).astype(np.int64),
        "sr_ticket_number": raw["store_sales"]["ss_ticket_number"][r_idx],
        "sr_return_quantity": rq.astype(np.int64),
        "sr_return_amt": ramt.astype(np.int64),
        "sr_return_tax": rtax.astype(np.int64),
        "sr_return_amt_inc_tax": (ramt + rtax).astype(np.int64),
        "sr_fee": np.full(n_sr, 500, np.int64),
        "sr_return_ship_cost": (ramt // 10).astype(np.int64),
        "sr_refunded_cash": (ramt * 7 // 10).astype(np.int64),
        "sr_reversed_charge": (ramt * 2 // 10).astype(np.int64),
        "sr_store_credit": (ramt - ramt * 7 // 10 - ramt * 2 // 10
                            ).astype(np.int64),
        "sr_net_loss": (ramt // 2 + 500).astype(np.int64),
    }

    # catalog_sales
    n_cs = max(1000, int(150000 * sf))
    order = np.arange(n_cs) // 3
    cs_date = sales_sks[(order * 197) % len(sales_sks)]
    cs_ship_lag = (np.arange(n_cs) * 29) % 120 + 1
    cs_bill = (order * 13) % n_cust + 1
    cs_ship_cust = (order * 13 + (order % 11 == 0)) % n_cust + 1
    m = _money(n_cs, 7)
    raw["catalog_sales"] = {
        "cs_sold_date_sk": cs_date.astype(np.int64),
        "cs_sold_time_sk": tsk[(np.arange(n_cs) * 71) % len(tsk)],
        "cs_ship_date_sk": (cs_date + cs_ship_lag).astype(np.int64),
        "cs_bill_customer_sk": cs_bill.astype(np.int64),
        "cs_bill_cdemo_sk": ((order * 23) % n_cd + 1).astype(np.int64),
        "cs_bill_hdemo_sk": ((order * 19) % n_hd + 1).astype(np.int64),
        "cs_bill_addr_sk": ((order * 17) % n_ca + 1).astype(np.int64),
        "cs_ship_customer_sk": cs_ship_cust.astype(np.int64),
        "cs_ship_cdemo_sk": ((order * 29) % n_cd + 1).astype(np.int64),
        "cs_ship_hdemo_sk": ((order * 31) % n_hd + 1).astype(np.int64),
        "cs_ship_addr_sk": ((order * 37) % n_ca + 1).astype(np.int64),
        "cs_call_center_sk": ((order * 3) % n_cc + 1).astype(np.int64),
        "cs_catalog_page_sk": ((np.arange(n_cs) * 7) % n_cp + 1).astype(np.int64),
        "cs_ship_mode_sk": ((np.arange(n_cs) * 3) % 20 + 1).astype(np.int64),
        "cs_warehouse_sk": ((np.arange(n_cs) * 5) % n_wh + 1).astype(np.int64),
        "cs_item_sk": ((np.arange(n_cs) * 41) % n_item + 1).astype(np.int64),
        "cs_promo_sk": ((np.arange(n_cs) * 11) % n_promo + 1).astype(np.int64),
        "cs_order_number": (order + 1).astype(np.int64),
        "cs_quantity": m["quantity"],
        "cs_wholesale_cost": m["wholesale_cost"],
        "cs_list_price": m["list_price"],
        "cs_sales_price": m["sales_price"],
        "cs_ext_discount_amt": m["ext_discount_amt"],
        "cs_ext_sales_price": m["ext_sales_price"],
        "cs_ext_wholesale_cost": m["ext_wholesale_cost"],
        "cs_ext_list_price": m["ext_list_price"],
        "cs_ext_tax": m["ext_tax"],
        "cs_coupon_amt": m["coupon_amt"],
        "cs_ext_ship_cost": m["ext_ship_cost"],
        "cs_net_paid": m["net_paid"],
        "cs_net_paid_inc_tax": m["net_paid_inc_tax"],
        "cs_net_paid_inc_ship": m["net_paid_inc_ship"],
        "cs_net_paid_inc_ship_tax": m["net_paid_inc_ship_tax"],
        "cs_net_profit": m["net_profit"],
    }

    r_idx = np.arange(0, n_cs, 9)
    n_cr = len(r_idx)
    rq = np.minimum(raw["catalog_sales"]["cs_quantity"][r_idx],
                    (np.arange(n_cr) % 5 + 1))
    ramt = raw["catalog_sales"]["cs_sales_price"][r_idx] * rq
    rtax = ramt * (np.arange(n_cr) % 10) // 100
    raw["catalog_returns"] = {
        "cr_returned_date_sk": (raw["catalog_sales"]["cs_sold_date_sk"][r_idx]
                                + (r_idx * 11) % 90 + 1).astype(np.int64),
        "cr_returned_time_sk": tsk[(r_idx * 7) % len(tsk)],
        "cr_item_sk": raw["catalog_sales"]["cs_item_sk"][r_idx],
        "cr_refunded_customer_sk": raw["catalog_sales"]["cs_bill_customer_sk"][r_idx],
        "cr_refunded_cdemo_sk": raw["catalog_sales"]["cs_bill_cdemo_sk"][r_idx],
        "cr_refunded_hdemo_sk": raw["catalog_sales"]["cs_bill_hdemo_sk"][r_idx],
        "cr_refunded_addr_sk": raw["catalog_sales"]["cs_bill_addr_sk"][r_idx],
        "cr_returning_customer_sk": raw["catalog_sales"]["cs_ship_customer_sk"][r_idx],
        "cr_returning_cdemo_sk": raw["catalog_sales"]["cs_ship_cdemo_sk"][r_idx],
        "cr_returning_hdemo_sk": raw["catalog_sales"]["cs_ship_hdemo_sk"][r_idx],
        "cr_returning_addr_sk": raw["catalog_sales"]["cs_ship_addr_sk"][r_idx],
        "cr_call_center_sk": raw["catalog_sales"]["cs_call_center_sk"][r_idx],
        "cr_catalog_page_sk": raw["catalog_sales"]["cs_catalog_page_sk"][r_idx],
        "cr_ship_mode_sk": raw["catalog_sales"]["cs_ship_mode_sk"][r_idx],
        "cr_warehouse_sk": raw["catalog_sales"]["cs_warehouse_sk"][r_idx],
        "cr_reason_sk": ((r_idx * 3) % n_reason + 1).astype(np.int64),
        "cr_order_number": raw["catalog_sales"]["cs_order_number"][r_idx],
        "cr_return_quantity": rq.astype(np.int64),
        "cr_return_amount": ramt.astype(np.int64),
        "cr_return_tax": rtax.astype(np.int64),
        "cr_return_amt_inc_tax": (ramt + rtax).astype(np.int64),
        "cr_fee": np.full(n_cr, 500, np.int64),
        "cr_return_ship_cost": (ramt // 10).astype(np.int64),
        "cr_refunded_cash": (ramt * 7 // 10).astype(np.int64),
        "cr_reversed_charge": (ramt * 2 // 10).astype(np.int64),
        "cr_store_credit": (ramt - ramt * 7 // 10 - ramt * 2 // 10
                            ).astype(np.int64),
        "cr_net_loss": (ramt // 2 + 500).astype(np.int64),
    }

    # web_sales
    n_ws = max(500, int(75000 * sf))
    order = np.arange(n_ws) // 3
    ws_date = sales_sks[(order * 193) % len(sales_sks)]
    ws_ship_lag = (np.arange(n_ws) * 23) % 120 + 1
    m = _money(n_ws, 11)
    raw["web_sales"] = {
        "ws_sold_date_sk": ws_date.astype(np.int64),
        "ws_sold_time_sk": tsk[(np.arange(n_ws) * 67) % len(tsk)],
        "ws_ship_date_sk": (ws_date + ws_ship_lag).astype(np.int64),
        "ws_item_sk": ((np.arange(n_ws) * 43) % n_item + 1).astype(np.int64),
        "ws_bill_customer_sk": ((order * 13) % n_cust + 1).astype(np.int64),
        "ws_bill_cdemo_sk": ((order * 23) % n_cd + 1).astype(np.int64),
        "ws_bill_hdemo_sk": ((order * 19) % n_hd + 1).astype(np.int64),
        "ws_bill_addr_sk": ((order * 17) % n_ca + 1).astype(np.int64),
        "ws_ship_customer_sk": ((order * 13 + (order % 13 == 0)) % n_cust
                                + 1).astype(np.int64),
        "ws_ship_cdemo_sk": ((order * 29) % n_cd + 1).astype(np.int64),
        "ws_ship_hdemo_sk": ((order * 31) % n_hd + 1).astype(np.int64),
        "ws_ship_addr_sk": ((order * 37) % n_ca + 1).astype(np.int64),
        "ws_web_page_sk": ((np.arange(n_ws) * 3) % n_wp + 1).astype(np.int64),
        "ws_web_site_sk": ((order * 5) % n_web + 1).astype(np.int64),
        "ws_ship_mode_sk": ((np.arange(n_ws) * 7) % 20 + 1).astype(np.int64),
        "ws_warehouse_sk": ((np.arange(n_ws) * 11) % n_wh + 1).astype(np.int64),
        "ws_promo_sk": ((np.arange(n_ws) * 13) % n_promo + 1).astype(np.int64),
        "ws_order_number": (order + 1).astype(np.int64),
        "ws_quantity": m["quantity"],
        "ws_wholesale_cost": m["wholesale_cost"],
        "ws_list_price": m["list_price"],
        "ws_sales_price": m["sales_price"],
        "ws_ext_discount_amt": m["ext_discount_amt"],
        "ws_ext_sales_price": m["ext_sales_price"],
        "ws_ext_wholesale_cost": m["ext_wholesale_cost"],
        "ws_ext_list_price": m["ext_list_price"],
        "ws_ext_tax": m["ext_tax"],
        "ws_coupon_amt": m["coupon_amt"],
        "ws_ext_ship_cost": m["ext_ship_cost"],
        "ws_net_paid": m["net_paid"],
        "ws_net_paid_inc_tax": m["net_paid_inc_tax"],
        "ws_net_paid_inc_ship": m["net_paid_inc_ship"],
        "ws_net_paid_inc_ship_tax": m["net_paid_inc_ship_tax"],
        "ws_net_profit": m["net_profit"],
    }

    r_idx = np.arange(0, n_ws, 9)
    n_wr = len(r_idx)
    rq = np.minimum(raw["web_sales"]["ws_quantity"][r_idx],
                    (np.arange(n_wr) % 5 + 1))
    ramt = raw["web_sales"]["ws_sales_price"][r_idx] * rq
    rtax = ramt * (np.arange(n_wr) % 10) // 100
    raw["web_returns"] = {
        "wr_returned_date_sk": (raw["web_sales"]["ws_sold_date_sk"][r_idx]
                                + (r_idx * 13) % 90 + 1).astype(np.int64),
        "wr_returned_time_sk": tsk[(r_idx * 11) % len(tsk)],
        "wr_item_sk": raw["web_sales"]["ws_item_sk"][r_idx],
        "wr_refunded_customer_sk": raw["web_sales"]["ws_bill_customer_sk"][r_idx],
        "wr_refunded_cdemo_sk": raw["web_sales"]["ws_bill_cdemo_sk"][r_idx],
        "wr_refunded_hdemo_sk": raw["web_sales"]["ws_bill_hdemo_sk"][r_idx],
        "wr_refunded_addr_sk": raw["web_sales"]["ws_bill_addr_sk"][r_idx],
        "wr_returning_customer_sk": raw["web_sales"]["ws_ship_customer_sk"][r_idx],
        "wr_returning_cdemo_sk": raw["web_sales"]["ws_ship_cdemo_sk"][r_idx],
        "wr_returning_hdemo_sk": raw["web_sales"]["ws_ship_hdemo_sk"][r_idx],
        "wr_returning_addr_sk": raw["web_sales"]["ws_ship_addr_sk"][r_idx],
        "wr_web_page_sk": raw["web_sales"]["ws_web_page_sk"][r_idx],
        "wr_reason_sk": ((r_idx * 7) % n_reason + 1).astype(np.int64),
        "wr_order_number": raw["web_sales"]["ws_order_number"][r_idx],
        "wr_return_quantity": rq.astype(np.int64),
        "wr_return_amt": ramt.astype(np.int64),
        "wr_return_tax": rtax.astype(np.int64),
        "wr_return_amt_inc_tax": (ramt + rtax).astype(np.int64),
        "wr_fee": np.full(n_wr, 500, np.int64),
        "wr_return_ship_cost": (ramt // 10).astype(np.int64),
        "wr_refunded_cash": (ramt * 7 // 10).astype(np.int64),
        "wr_reversed_charge": (ramt * 2 // 10).astype(np.int64),
        "wr_account_credit": (ramt - ramt * 7 // 10 - ramt * 2 // 10
                              ).astype(np.int64),
        "wr_net_loss": (ramt // 2 + 500).astype(np.int64),
    }

    # inventory: weekly snapshots x item x warehouse (subsampled)
    weekly = sales_sks[::7]
    item_step = max(1, n_item // max(1, int(200 * sf) or 1))
    inv_items = np.arange(1, n_item + 1, item_step)
    grid = np.stack(np.meshgrid(weekly, inv_items,
                                np.arange(1, n_wh + 1),
                                indexing="ij"), axis=-1).reshape(-1, 3)
    raw["inventory"] = {
        "inv_date_sk": grid[:, 0].astype(np.int64),
        "inv_item_sk": grid[:, 1].astype(np.int64),
        "inv_warehouse_sk": grid[:, 2].astype(np.int64),
        "inv_quantity_on_hand": ((grid[:, 0] * 7 + grid[:, 1] * 13
                                  + grid[:, 2]) % 1000).astype(np.int64),
    }

    return raw


_DT_MAP = {
    "int": dt.INT64,
    "str": dt.STRING,
    "date": dt.DATE,
    "dec2": dt.DECIMAL(2),
}


# fact tables cluster-sort on their date surrogate (the benchmark DDL's
# sort key) so date-range zone maps stay selective
CLUSTER_KEYS = {
    "store_sales": "ss_sold_date_sk", "catalog_sales": "cs_sold_date_sk",
    "web_sales": "ws_sold_date_sk", "store_returns": "sr_returned_date_sk",
    "catalog_returns": "cr_returned_date_sk",
    "web_returns": "wr_returned_date_sk", "inventory": "inv_date_sk",
}


def to_tables(raw: dict) -> dict[str, Table]:
    import numpy as np
    from starrocks_tpu.column import dtypes as _dt
    out = {}
    for tname, cols in raw.items():
        schema = dict(SCHEMA[tname])
        ck = CLUSTER_KEYS.get(tname)
        if ck and ck in cols:
            order = np.argsort(cols[ck], kind="stable")
            cols = {c: v[order] for c, v in cols.items()}
        columns = {}
        for cname, arr in cols.items():
            dtype = _DT_MAP[schema[cname]]
            # surrogate keys narrow to int32 (halves sort passes / traffic)
            if (dtype.kind is _dt.TypeKind.INT64 and cname.endswith("_sk")
                    and arr.size and arr.max() < 2**31 and arr.min() >= -1):
                arr, dtype = arr.astype(np.int32), _dt.INT32
            columns[cname] = Column.from_numpy(arr, dtype)
        out[tname] = Table(columns=columns)
    return out


def to_pandas(raw: dict):
    """Frames for golden executors: decimals in natural units (float),
    dates as ISO strings (sortable/comparable in SQLite)."""
    import pandas as pd

    out = {}
    for tname, cols in raw.items():
        schema = dict(SCHEMA[tname])
        data = {}
        for cname, arr in cols.items():
            t = schema[cname]
            if t == "dec2":
                data[cname] = arr.astype(np.float64) / 100.0
            elif t == "date":
                data[cname] = np.datetime64("1970-01-01") + \
                    arr.astype("timedelta64[D]")
                data[cname] = np.datetime_as_string(data[cname], unit="D"
                                                    ).astype(object)
            else:
                data[cname] = arr
        out[tname] = pd.DataFrame(data)
    return out
