package graft.model

/** Typed record beans — the reference's schema layer (SURVEY.md §1.3,
  * the reference `bean` package) as case classes with Spark Encoders. Strings stay
  * nullable references; optional numerics are Option[_] so absent JSON
  * fields survive the Dataset boundary.
  */
case class PageLog(
    mid: String, user_id: String, province_id: String, channel: String,
    is_new: String, model: String, operate_system: String,
    version_code: String, brand: String, page_id: String,
    last_page_id: String, page_item: String, page_item_type: String,
    during_time: Option[Long], sourceType: String, ts: Long)

case class StartLog(
    mid: String, user_id: String, province_id: String, channel: String,
    is_new: String, model: String, operate_system: String,
    version_code: String, brand: String, entry: String, open_ad_id: String,
    loading_time_ms: Option[Long], open_ad_ms: Option[Long],
    open_ad_skip_ms: Option[Long], ts: Long)

/** dau_wide row (ref bean/DauInfo.scala:3-38): PageLog minus last_page_id
  * plus user/province enrichment and derived dt/hr. */
case class DauInfo(
    mid: String, user_id: String, province_id: String, channel: String,
    is_new: String, model: String, operate_system: String,
    version_code: String, brand: String, page_id: String,
    page_item: String, page_item_type: String, during_time: Option[Long],
    sourceType: String, ts: Long,
    user_gender: String, user_age: Long,
    province_name: String, province_iso_code: String,
    province_3166_2: String, province_area_code: String,
    dt: String, hr: String)

/** order_info fact (ref bean/OrderInfo.scala:3-29; money kept Double for
  * oracle parity — DecimalType(18,2) is the production-correct choice). */
case class OrderInfo(
    id: Long, province_id: Long, order_status: String, user_id: Long,
    total_amount: Double, create_time: String)

case class OrderDetail(
    id: Long, order_id: Long, sku_id: Long, order_price: Double,
    sku_num: Long, sku_name: String, create_time: String,
    split_total_amount: Double)

/** order_wide serving row (ref bean/OrderWide.scala:5-60): the reflective
  * field-merge constructor becomes a join projection. */
case class OrderWide(
    detail_id: Long, order_id: Long, sku_id: Long, order_price: Double,
    sku_num: Long, sku_name: String, split_total_amount: Double,
    province_id: Long, order_status: String, user_id: Long,
    total_amount: Double, create_time: String,
    create_date: String, create_hour: String,
    province_name: String, province_iso_code: String,
    province_3166_2: String, province_area_code: String,
    user_gender: String, user_age: Long)
